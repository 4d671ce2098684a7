#!/usr/bin/env python
"""TPU: ablate the regen-loop features (lane sort, tri-tile culling, tile
size) on the real renderer to find where iteration time goes."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.core import rng
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.ops import intersect as oi
from monte_carlo_path_tracing_tpu.ops import intersect_pallas as ip
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    res = 1024
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=res, height=res)
    )
    n_pix = res * res
    key = rng.base_key(0)
    build = oi._build

    cases = [
        # (label, ray_sort, cull, tri_tile)
        ("sort+cull tt128", True, True, 128),
        ("sort only tt128", True, False, 128),
        ("cull only tt128", False, True, 128),
        ("neither  tt128", False, False, 128),
        ("sort+cull tt256", True, True, 256),
        ("neither  tt896", False, False, 896),
    ]
    total = jnp.int32(n_pix * 2)   # 2 spp of work for timing
    warm = jnp.int32(1 << 16)
    for label, sort, cull, tt in cases:
        ip.TRI_TILE = tt
        if cull:
            oi._build = build
        else:
            oi._build = lambda v0, e1, e2, ids, block: dataclasses.replace(
                build(v0, e1, e2, ids, block), aabb_lo=None, aabb_hi=None
            )
        cfg = RenderConfig(width=res, height=res, spp=2, estimator="mis",
                           max_depth=16, seed=0, ray_sort=sort)
        run = jax.jit(
            lambda s, k, tot: render_regen(s, cfg, k, n_pix, tot, lanes=1 << 16)
        )
        try:
            t0 = time.perf_counter()
            out = run(scene, key, warm)
            np.asarray(out[0])
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = run(scene, key, total)
            np.asarray(out[0])
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"{label}: FAILED {str(e)[:140]}", flush=True)
            continue
        nrays, iters = float(out[1]), int(out[2])
        print(f"{label}: {dt:6.2f}s {nrays/dt/1e6:6.2f} Mrays/s "
              f"{iters} iters {dt/iters*1e3:6.2f} ms/iter "
              f"(compile {tc:.0f}s)", flush=True)
    oi._build = build


if __name__ == "__main__":
    main()
