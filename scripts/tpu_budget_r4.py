#!/usr/bin/env python
"""Round-4 end-to-end budget of the primary-cache renderer on the v5e.

Same END-TO-END ablation methodology as docs/tpu_iteration_budget_r3.json
(standalone per-op microbenchmarks are tunnel-inflated 5-20x on this
platform and not trusted): every row is a full render timed to a
host-materialized framebuffer checksum, one knob changed per row.

Rows: uncached vs cached, lanes sweep for the seeded loop, spp scaling
(the per-pixel pre-pass amortizes over spp — BASELINE.json's target
config is 1024 spp), prepass-alone cost.

Writes docs/tpu_iteration_budget_r4.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.core import rng
from monte_carlo_path_tracing_tpu.integrator.regen import (
    primary_prepass, render_regen, render_regen_cached,
)
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
RES = 1024


def main():
    scene = load_scene(os.path.join(HERE, "scenes", "veach-mis", "veach-mis.obj"))
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=RES, height=RES))
    n_pix = RES * RES
    key = rng.base_key(0)

    def cfg_for(spp):
        return RenderConfig(
            width=RES, height=RES, spp=spp, estimator="mis",
            light_sampler="spherical_triangle", max_depth=16, seed=0)

    def best_of(f, reps=3):
        out = f()
        jax.tree_util.tree_map(np.asarray, out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f()
            _ = float(np.asarray(out[0]).sum())
            best = min(best, time.perf_counter() - t0)
        return best, out

    rows = {}

    # Uncached baseline at the bench config.
    cfg8 = cfg_for(8)
    un = jax.jit(lambda: render_regen(scene, cfg8, key, n_pix,
                                      jnp.int32(n_pix * 8), lanes=1 << 15))
    dt, out = best_of(un)
    rows["uncached_32k_spp8"] = {
        "s": round(dt, 3), "mrays_logical": round(float(out[1]) / dt / 1e6, 3)}
    print(json.dumps(rows, indent=1), flush=True)

    # Prepass alone (spp 8).
    pre = jax.jit(lambda: primary_prepass(scene, cfg8, key, n_pix, 8,
                                          jnp.int32(8)))
    dt, out = best_of(pre)
    rows["prepass_spp8"] = {"s": round(dt, 3), "seeds": int(out[5])}
    print(json.dumps(rows["prepass_spp8"]), flush=True)

    # Cached: lanes sweep at spp 8.
    for lanes in (1 << 14, 1 << 15, 1 << 16):
        fn = jax.jit(lambda lanes=lanes: render_regen_cached(
            scene, cfg8, key, n_pix, 8, jnp.int32(8), lanes=lanes))
        dt, out = best_of(fn)
        rows[f"cached_lanes{lanes >> 10}k_spp8"] = {
            "s": round(dt, 3),
            "mrays_logical": round(float(out[1]) / dt / 1e6, 3),
            "loop_iters": int(out[2]),
        }
        print(json.dumps(rows[f"cached_lanes{lanes >> 10}k_spp8"]), flush=True)

    # spp scaling at 32k lanes (per-pixel pre-pass amortizes over spp).
    for spp in (16, 32):
        cfg = cfg_for(spp)
        fn = jax.jit(lambda cfg=cfg, spp=spp: render_regen_cached(
            scene, cfg, key, n_pix, spp, jnp.int32(spp), lanes=1 << 15))
        dt, out = best_of(fn, reps=2)
        rows[f"cached_32k_spp{spp}"] = {
            "s": round(dt, 3),
            "mrays_logical": round(float(out[1]) / dt / 1e6, 3),
            "rays_physical_frac": round(
                float(out[3].rays_physical) / float(out[1]), 3),
        }
        print(json.dumps(rows[f"cached_32k_spp{spp}"]), flush=True)

    report = {
        "device": str(jax.devices()[0]),
        "method": "END-TO-END: full renders timed to a host-materialized "
                  "framebuffer checksum, one knob per row; best-of-3 "
                  "(the device's throughput swings ~2x with tenancy).",
        "scene": "veach-mis 1024x1024, mis + arvo spherical",
        "rows": rows,
        "prepass_component_ablation_spp8": {
            "note": "measured in-context by nulling one component of the "
                    "prepass at a time (round-4 session): total ~2.44 s = "
                    "shadow+NEE-math ~1.15 s (5.1M compacted rows) + "
                    "Arvo warp/pick ~0.37 s + primary trace/prepare/RR/"
                    "BRDF/seed-write ~0.9 s; survivor compaction took the "
                    "per-sample stages from 100% to a 62.5% prefix "
                    "(~44% live).",
        },
    }
    with open(os.path.join(HERE, "docs", "tpu_iteration_budget_r4.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote docs/tpu_iteration_budget_r4.json", flush=True)


if __name__ == "__main__":
    main()
