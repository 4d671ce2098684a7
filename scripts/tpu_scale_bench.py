#!/usr/bin/env python
"""Triangle-count scaling study: the same veach-mis image rendered with
the geometry midpoint-subdivided 0/1/2 levels (3.1k -> 12.4k -> 49.5k
non-light triangles, identical surfaces — scene/transform.py), regen MIS
end-to-end plus standalone nearest/occluded kernels and the grid DDA.

Answers, with the image held fixed: where does the all-pairs design stop
scaling, does tri-tile culling + lane sorting start paying at higher T
(its per-kernel win was real but net-negative at 3.5k,
docs/tpu_sort_cull.json), and where is the grid crossover — the claims
ARCHITECTURE.md makes about larger scenes.

Writes docs/tpu_scale_bench.json.
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

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.core import rng
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.scene.transform import subdivide_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "docs", "tpu_scale_bench.json")

RES = 512
SPP = 4
LANES = 1 << 15


def bench_regen(scene, cfg, key, reps=2):
    n_pix = RES * RES
    run = jax.jit(lambda s, k, tot: render_regen(
        s, cfg, k, n_pix, tot, lanes=LANES))
    np.asarray(run(scene, key, jnp.int32(LANES))[0])
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fb, nrays, iters, _ = run(scene, key, jnp.int32(n_pix * SPP))
        cs = float(np.asarray(fb).sum())
        dt = time.perf_counter() - t0
        best = min(best or dt, dt)
    return best, float(nrays), cs


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    base = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    base = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera, width=RES, height=RES))
    key = rng.base_key(0)
    results = {"device": str(jax.devices()[0]), "res": RES, "spp": SPP,
               "lanes": LANES}

    for lvl in (0, 1, 2):
        scene = subdivide_scene(base, lvl) if lvl else base
        T = int(scene.num_tris)
        row = {"tris": T}

        cfg = RenderConfig(width=RES, height=RES, spp=SPP, estimator="mis",
                           light_sampler="spherical_triangle", max_depth=16,
                           ray_chunk=LANES, seed=0)
        dt, nrays, cs = bench_regen(scene, cfg, key)
        row["regen_allpairs"] = {
            "seconds": round(dt, 3), "mrays": round(nrays / dt / 1e6, 3),
            "checksum": cs,
        }
        print(f"lvl{lvl} T={T} all-pairs: {dt:.3f}s "
              f"{nrays/dt/1e6:.3f} Mrays/s checksum={cs:.1f}", flush=True)

        # sorted lanes + tri-tile culling (the knob that loses at 3.5k).
        # The cull kernels hold ALL W tiles resident in VMEM (the ordered
        # traversal needs random tile access), so they OOM scoped VMEM at
        # large T — recorded as such rather than fatal.
        ops.CULL_NEAREST = ops.CULL_OCCLUDED = True
        try:
            dt2, nrays2, cs2 = bench_regen(
                scene, cfg.replace(ray_sort=True), key)
            row["regen_sort_cull"] = {
                "seconds": round(dt2, 3),
                "mrays": round(nrays2 / dt2 / 1e6, 3), "checksum": cs2,
            }
            print(f"lvl{lvl} T={T} sort+cull: {dt2:.3f}s "
                  f"{nrays2/dt2/1e6:.3f} Mrays/s checksum={cs2:.1f}",
                  flush=True)
        except Exception as e:  # vmem OOM at large T
            row["regen_sort_cull"] = {"error": str(e).split("\n")[0][:200]}
            print(f"lvl{lvl} T={T} sort+cull: FAILED "
                  f"({str(e).splitlines()[0][:120]})", flush=True)
        finally:
            ops.CULL_NEAREST = ops.CULL_OCCLUDED = False

        results[f"lvl{lvl}"] = row

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
