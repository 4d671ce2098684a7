#!/usr/bin/env python
"""TPU bring-up: correctness vs CPU + small benchmark on the real chip."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def main():
    print("devices:", jax.devices(), flush=True)
    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=128, height=72)
    )
    cfg = RenderConfig(spp=1, estimator="mis", light_sampler="spherical_triangle",
                       max_depth=6, seed=0)
    idx = jnp.arange(128 * 72, dtype=jnp.int32)
    ro, rd = generate_rays(scene.camera, idx)
    key = jax.random.key(0)

    fn = jax.jit(lambda sc, k, o, d: render_rays(sc, cfg, k, o, d))

    t0 = time.perf_counter()
    with jax.default_device(tpu):
        out_tpu = np.asarray(fn(scene, key, ro, rd))
    print(f"tpu first call: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    with jax.default_device(tpu):
        out_tpu2 = np.asarray(fn(scene, key, ro, rd))
    print(f"tpu second call: {time.perf_counter()-t0:.2f}s", flush=True)

    with jax.default_device(cpu):
        out_cpu = np.asarray(jax.jit(lambda sc, k, o, d: render_rays(sc, cfg, k, o, d))(scene, key, ro, rd))

    print("tpu finite:", np.isfinite(out_tpu).all(),
          "mean tpu", out_tpu.mean(), "mean cpu", out_cpu.mean(), flush=True)
    # same threefry streams on both backends -> images should closely agree
    diff = np.abs(out_tpu - out_cpu)
    rel = diff.mean() / (np.abs(out_cpu).mean() + 1e-9)
    print("mean abs diff:", diff.mean(), "rel:", rel, flush=True)
    print("match(1e-2 rel):", rel < 1e-2, flush=True)

    print("== pixel determinism on tpu:", np.abs(out_tpu - out_tpu2).max(), flush=True)


if __name__ == "__main__":
    main()
