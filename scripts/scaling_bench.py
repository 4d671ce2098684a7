#!/usr/bin/env python
"""Weak-scaling efficiency of the sharded renderer over an N-device mesh.

BASELINE.json asks for >=80% rays/s scaling efficiency from 1 chip to >=2
hosts; real multi-chip hardware is not available in this environment, so
this harness measures the same code path on the virtual CPU mesh
(--xla_force_host_platform_device_count) — it validates the sharding and
measures the overhead of the distribution machinery, not ICI. Run it on a
pod slice unchanged for the real number.
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# SCALE_PLATFORM=tpu to run on real chips (pod slice); default virtual CPU.
os.environ["JAX_PLATFORMS"] = os.environ.get("SCALE_PLATFORM", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.parallel import make_mesh, render_rays_sharded
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    scene = dataclasses.replace(scene, camera=cam)
    cfg = RenderConfig(spp=1, estimator="mis", light_sampler="spherical_triangle",
                       max_depth=8)

    on_cpu_mesh = jax.default_backend() == "cpu"
    per_dev = int(os.environ.get("SCALE_RAYS_PER_DEV", "2048"))
    key = jax.random.key(0)
    results = {}

    def run(nd, n):
        mesh = make_mesh((nd,), ("tiles",), devices=jax.devices()[:nd])
        idx = jnp.arange(n, dtype=jnp.int32) % (256 * 256)
        ro, rd = generate_rays(cam, idx)
        out = render_rays_sharded(scene, cfg, key, ro, rd, mesh)
        np.asarray(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = render_rays_sharded(scene, cfg, key, ro, rd, mesh)
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    def run_regen(nd, lanes_per_dev, spp):
        from monte_carlo_path_tracing_tpu.parallel.sharded import (
            make_regen_sharded,
        )

        mesh = make_mesh((nd,), ("tiles",), devices=jax.devices()[:nd])
        fn = make_regen_sharded(scene, cfg, mesh, lanes_per_dev)
        np.asarray(fn(scene, key, jnp.int32(1))[0])
        t0 = time.perf_counter()
        fb, nrays = fn(scene, key, jnp.int32(spp))
        np.asarray(fb)
        return time.perf_counter() - t0, float(nrays)

    if on_cpu_mesh:
        # Virtual devices share the same silicon, so rays/s cannot scale
        # with device count; the meaningful CPU-mesh number is the
        # *overhead* of the sharding machinery at fixed total work.
        n = per_dev * 8
        t1 = run(1, n)
        t8 = run(8, n)
        print(f"1 device:  {n} rays in {t1*1e3:.1f} ms", flush=True)
        print(f"8 devices: {n} rays in {t8*1e3:.1f} ms", flush=True)
        # The production bench path: sharded regen, fixed total lanes.
        tr1, rays1 = run_regen(1, 2048, 2)
        tr8, rays8 = run_regen(8, 256, 2)
        print(f"regen 1 device:  {tr1*1e3:.1f} ms ({rays1:.0f} rays)", flush=True)
        print(f"regen 8 devices: {tr8*1e3:.1f} ms ({rays8:.0f} rays)", flush=True)
        result = {
            "sharding_overhead_pct": round(100 * (t8 / t1 - 1), 1),
            "regen_sharding_overhead_pct": round(100 * (tr8 / tr1 - 1), 1),
            "regen_rays_match": abs(rays1 - rays8) / rays1 < 0.02,
            "mesh": "virtual CPU, fixed total work (validates the sharded "
                    "path; run with SCALE_PLATFORM=tpu on a pod slice for "
                    "real scaling efficiency)",
        }
        print(json.dumps(result))
        out = os.path.join(here, "docs", "scaling_cpu_mesh.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", out)
        return

    for nd in (1, 2, 4, 8, 16, 32):
        if nd > len(jax.devices()):
            break
        n = per_dev * nd
        dt = run(nd, n)
        results[nd] = n / dt
        print(f"devices={nd}: {n} rays in {dt*1e3:.1f} ms -> "
              f"{n/dt:.0f} rays/s", flush=True)
    base = results[1]
    effs = {nd: r / (base * nd) for nd, r in results.items()}
    print(json.dumps({
        "weak_scaling_eff": {str(k): round(v, 3) for k, v in effs.items()},
    }))


if __name__ == "__main__":
    main()
