#!/usr/bin/env python
"""mxu_fast variance study (round-2 VERDICT item: "decide mxu_fast with
data").

The bf16x3 dot mode flips accept decisions deterministically on a
~1e-5-relative fringe (ops/intersect_pallas.py). The question this answers:
does that fringe move rendered IMAGES by more than ordinary MC noise?
Method: render cornell + veach at several seeds in both dot modes; compare
   - across-mode same-seed RMSE (the dot-mode effect), vs
   - across-seed same-mode RMSE (the MC-noise yardstick).
If the mode effect is well under the seed effect at equal spp, mxu_fast is
statistically free and its ~12% nearest-kernel saving is pure win.

Writes docs/tpu_dotmode_variance.json.
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
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "docs", "tpu_dotmode_variance.json")

RES = 128
SPP = 16
SEEDS = (0, 1, 2, 3)


def make_render(mode):
    """One jitted program per dot mode (the seed rides in as the key
    argument, so all seeds share the compile)."""
    cfg = RenderConfig(width=RES, height=RES, spp=SPP, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=32,
                       dot_mode=mode)
    n_pix = RES * RES
    run = jax.jit(
        lambda s, k: render_regen(s, cfg, k, n_pix, n_pix * SPP, lanes=1 << 16)
    )
    return lambda scene, seed: np.asarray(
        run(scene, rng.base_key(seed))[0]
    ) / SPP


def rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    results = {"device": str(jax.devices()[0]), "res": RES, "spp": SPP}
    for name in ("cornell/cornell.obj", "veach-mis/veach-mis.obj"):
        scene = load_scene(os.path.join(here, "scenes", name))
        scene = dataclasses.replace(
            scene, camera=dataclasses.replace(scene.camera, width=RES, height=RES))
        t0 = time.perf_counter()
        r_vpu, r_fast = make_render("vpu"), make_render("mxu_fast")
        vpu = {s: r_vpu(scene, s) for s in SEEDS}
        fast = {s: r_fast(scene, s) for s in SEEDS}
        mode_rmse = [rmse(vpu[s], fast[s]) for s in SEEDS]
        seed_rmse = [rmse(vpu[a], vpu[b])
                     for i, a in enumerate(SEEDS) for b in SEEDS[i + 1:]]
        key = name.split("/")[0]
        results[key] = {
            "mean_radiance": float(np.mean(list(vpu.values()))),
            "mode_rmse_same_seed": [round(x, 6) for x in mode_rmse],
            "seed_rmse_same_mode": [round(x, 6) for x in seed_rmse],
            "mode_over_seed_ratio": round(
                float(np.mean(mode_rmse) / np.mean(seed_rmse)), 4),
            "seconds": round(time.perf_counter() - t0, 1),
        }
        print(key, json.dumps(results[key]), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
