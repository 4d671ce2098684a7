#!/usr/bin/env python
"""Round-5 decomposition of the sharded train step's weak-scaling loss.

VERDICT r4 item 3: weak_scaling_train_step reached only 0.477 of the
core-bound ideal at 8 virtual CPU devices while the forward regen path
reached 0.937 — undiagnosed. This harness decomposes one train step
(parallel/sharded.py::make_train_step) into phases, per device count and
per work size:

  - fwd:    forward-only loss under the same shard_map (no grad)
  - nored:  value_and_grad WITHOUT the pmean grad reduction (local grads)
  - full:   the production step (grad + pmean over axes + update)

  backward  = nored - fwd;  collective+update = full - nored.

The host has 2 physical cores, so the compute-bound ideal for nd virtual
devices is t1 * max(1, nd/nproc); efficiency is reported against that
bound (eff_vs_core_bound), as in scripts/scaling_bench.py. Memory-
bandwidth contention between virtual devices is NOT in the bound — the
backward pass's residual traffic is the prime suspect and shows up as a
backward share that GROWS with nd if bandwidth-bound.

Writes docs/train_step_scaling_r5.json.
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import json

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.parallel import make_mesh
from monte_carlo_path_tracing_tpu.parallel.mesh import AXIS_TILES
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def make_variant(scene, cfg, mesh, which, lr=2e-2):
    """Phase variants of make_train_step with the same shard_loss body."""

    def shard_loss(materials, key, ro, rd, target):
        sc = scene.with_materials(materials)
        rad = render_rays(sc, cfg, key, ro, rd)
        local = jnp.sum((rad - target) ** 2)
        n_local = jnp.asarray(ro.shape[0], jnp.float32)
        total = jax.lax.psum(local, AXIS_TILES)
        count = jax.lax.psum(n_local, AXIS_TILES) * 3.0
        return total / count

    def shard_step(materials, key, ro, rd, target):
        if which == "fwd":
            return materials, shard_loss(materials, key, ro, rd, target)
        loss, grads = jax.value_and_grad(shard_loss)(
            materials, key, ro, rd, target)
        if which == "nored":
            # local grads only — no inter-device reduction, no update
            return materials, loss + 0.0 * sum(
                jnp.sum(g) for g in jax.tree.leaves(grads))
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, (AXIS_TILES,)), grads)
        new = jax.tree.map(lambda p, g: p - lr * g, materials, grads)
        return new, loss

    step = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(), P(AXIS_TILES), P(AXIS_TILES), P(AXIS_TILES)),
        out_specs=(P(), P()), check_vma=False,
    )
    return jax.jit(step)


def main():
    scene = load_scene(os.path.join(HERE, "scenes", "veach-mis", "veach-mis.obj"))
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    scene = dataclasses.replace(scene, camera=cam)
    cfg = RenderConfig(spp=1, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=8)
    key = jax.random.key(0)
    nproc = os.cpu_count() or 1
    sizes = [int(s) for s in
             os.environ.get("TRAIN_SCALE_SIZES", "2048,8192").split(",")]
    reps = int(os.environ.get("TRAIN_SCALE_REPS", "2"))

    out = {}
    for per_dev in sizes:
        rows = {}
        for nd in (1, 2, 4, 8):
            mesh = make_mesh((nd,), ("tiles",), devices=jax.devices()[:nd])
            n = per_dev * nd
            idx = jnp.arange(n, dtype=jnp.int32) % (cam.width * cam.height)
            ro, rd = generate_rays(cam, idx)
            target = jnp.full((n, 3), 0.25)
            row = {}
            for which in ("fwd", "nored", "full"):
                step = make_variant(scene, cfg, mesh, which)
                o = step(scene.materials, key, ro, rd, target)
                jax.block_until_ready(o)          # compile + first run
                best = 1e9
                cpu_frac = 0.0
                for _ in range(reps):
                    c0 = time.process_time()
                    t0 = time.perf_counter()
                    o = step(scene.materials, key, ro, rd, target)
                    jax.block_until_ready(o)
                    dt = time.perf_counter() - t0
                    best = min(best, dt)
                    cpu_frac = max(cpu_frac, (time.process_time() - c0) / dt)
                row[which] = round(best, 4)
                # cores actually used: if ~nproc already at nd=1, the
                # honest parallel bound is t1*nd, NOT t1*nd/nproc
                row[f"{which}_cores_used"] = round(cpu_frac, 2)
            row["backward_s"] = round(row["nored"] - row["fwd"], 4)
            row["reduce_update_s"] = round(row["full"] - row["nored"], 4)
            rows[str(nd)] = row
            print(f"per_dev={per_dev} nd={nd}: {row}", flush=True)
        t1 = rows["1"]["full"]
        cores1 = max(rows["1"].get("full_cores_used", 1.0), 1.0)
        for nd_s, row in rows.items():
            nd = int(nd_s)
            ideal = t1 * max(1.0, nd / nproc)
            row["eff_raw"] = round(t1 / row["full"], 3)
            row["eff_vs_core_bound"] = round(ideal / row["full"], 3)
            # honest bound: the nd=1 step already uses cores1 of the
            # nproc cores, so nd devices can at best run in
            # t1 * nd / (nproc / cores1)
            ideal_h = t1 * max(1.0, nd * cores1 / nproc)
            row["eff_vs_occupancy_bound"] = round(ideal_h / row["full"], 3)
        out[f"rays_per_dev_{per_dev}"] = rows

    out_path = os.path.join(HERE, "docs", "train_step_scaling_r5.json")
    try:
        with open(out_path) as f:
            prev = json.load(f).get("rows", {})
    except FileNotFoundError:
        prev = {}
    prev.update(out)
    out = prev
    report = {
        "mesh": "virtual CPU devices, one host, 2 physical cores; "
                "eff_vs_core_bound divides by t1 * max(1, nd/nproc); "
                "eff_vs_occupancy_bound additionally credits the cores the "
                "nd=1 step ALREADY uses (XLA CPU intra-op parallelism) — "
                "see <which>_cores_used.",
        "nproc": nproc,
        "scene": "veach-mis 256x256, mis+arvo, depth 8, spp 1",
        "phases": "fwd = loss only; nored = +backward, no grad reduction; "
                  "full = production step (pmean + sgd update). "
                  "backward_s = nored - fwd; reduce_update_s = full - nored.",
        "rows": out,
    }
    print(json.dumps(report, indent=1))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote docs/train_step_scaling_r5.json", flush=True)


if __name__ == "__main__":
    main()
