#!/usr/bin/env python
"""Round-5 stage-by-stage decomposition of the primary-cache pre-pass.

VERDICT r4 item 1: the prepass is 53% of the headline bench and its
shadow+NEE block appears to run ~5x below the coherent kernels' measured
pace. This script pins WHERE the time goes using the in-context
one-knob-nulled method (regen._ABLATE): every row is the FULL prepass
(veach 1024x1024, mis+arvo, spp 8) timed to a host materialization, with
exactly one stage nulled at trace time; the stage's cost is the delta
from baseline. Tenancy drift is controlled two ways: a fixed-work matmul
probe brackets every row (rows measured in a slow phase are flagged), and
the baseline is re-timed at the end so drift shows up as a baseline shift.

Writes docs/tpu_prepass_profile.json.
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
RES = 1024
SPP = 8

KNOBS = [
    "noprimary",    # per-pixel primary trace (coherent culled camera fan)
    "noprepare",    # per-pixel Arvo prepare (quadratic-form weights)
    "norngsetup",   # dense [S] stream-key folds + RR uniform
    "noargsort",    # survivor compaction sort
    "nogather",     # per-row gathers (si fields, cdf, wsum, keys)
    "nopick",       # CDF compare-sum light pick
    "nowarp",       # Arvo warp + light_table gather (sample_from_pick)
    "noshadow",     # shadow any-hit kernel (occlusion trace)
    "nonee",        # whole NEE block (pick+warp+shadow+math+fb scatter)
    "nobrdf",       # phong sample+eval
    "noseeds",      # seed scatters into [total+1] buffers
    "nofb",         # fb_acc scatter-add
]


def main():
    scene = load_scene(os.path.join(HERE, "scenes", "veach-mis", "veach-mis.obj"))
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=RES, height=RES))
    n_pix = RES * RES
    key = rng.base_key(0)
    cfg = RenderConfig(
        width=RES, height=RES, spp=SPP, estimator="mis",
        light_sampler="spherical_triangle", max_depth=16, seed=0)

    calib_a = jnp.full((2048, 2048), 1e-3, jnp.float32)
    calib_fn = jax.jit(lambda a: jax.lax.fori_loop(
        0, 32, lambda _, x: 1e-3 * (x @ calib_a), a))
    np.asarray(calib_fn(calib_a))

    def calib():
        t0 = time.perf_counter()
        np.asarray(calib_fn(calib_a))
        return round(time.perf_counter() - t0, 4)

    def time_prepass(knob, reps=3):
        regen._ABLATE = frozenset([knob]) if knob else frozenset()
        try:
            fn = jax.jit(lambda: regen.primary_prepass(
                scene, cfg, key, n_pix, SPP, jnp.int32(SPP)))
            out = fn()
            np.asarray(out[0])  # compile + first run
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                _ = float(np.asarray(out[0]).sum())
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            regen._ABLATE = frozenset()

    out_path = os.path.join(HERE, "docs", "tpu_prepass_profile.json")
    try:
        with open(out_path) as f:
            rows = json.load(f).get("rows", {})
    except FileNotFoundError:
        rows = {}
    knobs = os.environ.get("PROFILE_KNOBS")
    knobs = knobs.split(",") if knobs else KNOBS

    c0 = calib()
    base = time_prepass(None)
    rows.setdefault("baseline_runs", []).append(
        {"s": round(base, 3), "calib_before": c0})
    rows["baseline"] = {"s": round(base, 3), "calib_before": c0}
    print(json.dumps(rows["baseline"]), flush=True)

    for knob in knobs:
        c = calib()
        dt = time_prepass(knob)
        rows[knob] = {
            "s": round(dt, 3),
            "delta_vs_baseline_s": round(base - dt, 3),
            "calib_before": c,
        }
        print(knob, json.dumps(rows[knob]), flush=True)

    report = {
        "device": str(jax.devices()[0]),
        "method": "one-knob-nulled FULL prepass (regen._ABLATE), timed to "
                  "host materialization, best-of-3; calib = fixed-work "
                  "matmul probe before each row (tenancy label).",
        "scene": f"veach-mis {RES}x{RES}, mis+arvo, spp {SPP}",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote docs/tpu_prepass_profile.json", flush=True)


if __name__ == "__main__":
    main()
