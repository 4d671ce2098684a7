#!/usr/bin/env python
"""Grid (3D-DDA) vs all-pairs intersection on the TPU.

The reference's accelerator is a uniform grid walked per ray
(/root/reference/Myobj.cpp:334-474). The TPU engine is all-pairs-first
(ops/intersect*.py) because data-dependent traversal defeats the vector
units at the bundled scenes' ~3k-triangle scale; this script records the
measurement behind that claim (cited by docs/ARCHITECTURE.md).

Writes docs/tpu_grid_vs_allpairs.json.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.ops import grid as grid_mod
from monte_carlo_path_tracing_tpu.ops import intersect as ops
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.timing import timed

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "docs", "tpu_grid_vs_allpairs.json")


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    N = 1 << 16
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro, rd = generate_rays(cam, idx)

    results = {"device": str(jax.devices()[0]), "rays": N,
               "tris": int(scene.num_tris)}

    accel = ops.build_accel(scene)
    f_allpairs = jax.jit(lambda ro, rd: ops.intersect(accel, ro, rd, impl="pallas"))
    dt, hit_ap = timed(f_allpairs, ro, rd, n=20)
    results["allpairs_pallas_ms"] = round(dt * 1e3, 2)
    print(f"all-pairs pallas: {dt*1e3:.2f} ms", flush=True)

    for n0 in (10_000, 100_000):
        grid = grid_mod.build_grid(scene, n0=n0)
        f_grid = jax.jit(lambda ro, rd: grid_mod.intersect_grid(grid, ro, rd))
        dt_g, hit_g = timed(f_grid, ro, rd, n=5)
        agree = float(np.mean(np.asarray(hit_g.tri_id) == np.asarray(hit_ap.tri_id)))
        results[f"grid_n0_{n0}_ms"] = round(dt_g * 1e3, 2)
        results[f"grid_n0_{n0}_tri_agree"] = round(agree, 6)
        print(f"grid n0={n0}: {dt_g*1e3:.2f} ms, tri agreement {agree:.4f}",
              flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
