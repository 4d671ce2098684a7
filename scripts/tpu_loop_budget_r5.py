#!/usr/bin/env python
"""Round-5 ablation budget of the SEEDED regen loop (the other half of
the headline bench — the prepass half is docs/tpu_prepass_profile.json).

Method: full render_regen_cached at the bench config with one regen-LOOP
knob nulled per row (integrator/regen._ABLATE "loop_*" knobs). Only
VALUE-path knobs exist — the while_loop's masks and iteration count are
draw-driven, so a row is timing-comparable iff its iteration count
equals the baseline's (asserted per row). The prepass runs identically
in every row, so deltas isolate loop components. Tenancy-labeled by a
calib probe per row.

Writes docs/tpu_loop_budget_r5.json.
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
from monte_carlo_path_tracing_tpu.integrator import regen
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
RES, SPP, LANES = 1024, 8, 1 << 14

KNOBS = ["loop_noshadow", "loop_noarvo", "loop_nonee", "loop_nobrdfeval",
         "loop_nofb"]


def main():
    scene = load_scene(os.path.join(HERE, "scenes", "veach-mis", "veach-mis.obj"))
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=RES, height=RES))
    n_pix = RES * RES
    key = rng.base_key(0)
    cfg = RenderConfig(width=RES, height=RES, spp=SPP, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=16,
                       seed=0)

    ca = jnp.full((2048, 2048), 1e-3)
    cal = jax.jit(lambda a: jax.lax.fori_loop(0, 32, lambda _, x: 1e-3 * (x @ ca), a))
    np.asarray(cal(ca))

    def calib():
        t0 = time.perf_counter()
        np.asarray(cal(ca))
        return round(time.perf_counter() - t0, 3)

    def timeit(knob, reps=3):
        regen._ABLATE = frozenset([knob]) if knob else frozenset()
        try:
            fn = jax.jit(lambda: regen.render_regen_cached(
                scene, cfg, key, n_pix, SPP, jnp.int32(SPP), lanes=LANES))
            out = fn()
            np.asarray(out[0])
            best, iters = 1e9, int(out[2])
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                np.asarray(out[0]).sum()
                best = min(best, time.perf_counter() - t0)
            return best, iters
        finally:
            regen._ABLATE = frozenset()

    rows = {}
    c0 = calib()
    base, base_iters = timeit(None)
    rows["baseline"] = {"s": round(base, 3), "iters": base_iters,
                        "calib_before": c0}
    print(json.dumps(rows["baseline"]), flush=True)
    for knob in KNOBS:
        c = calib()
        dt, iters = timeit(knob)
        assert iters == base_iters, (knob, iters, base_iters)
        rows[knob] = {"s": round(dt, 3),
                      "delta_vs_baseline_s": round(base - dt, 3),
                      "iters": iters, "calib_before": c}
        print(knob, json.dumps(rows[knob]), flush=True)

    report = {
        "device": str(jax.devices()[0]),
        "config": f"veach 1024x1024 spp {SPP}, mis+arvo, lanes {LANES}, "
                  "FULL cached render (prepass constant across rows)",
        "method": "one VALUE-path loop knob nulled per row; iteration "
                  "count asserted equal to baseline so rows are "
                  "timing-comparable; calib probe labels tenancy.",
        "rows": rows,
    }
    print(json.dumps(report, indent=1))
    with open(os.path.join(HERE, "docs", "tpu_loop_budget_r5.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote docs/tpu_loop_budget_r5.json", flush=True)


if __name__ == "__main__":
    main()
