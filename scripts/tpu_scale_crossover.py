#!/usr/bin/env python
"""Acceleration-structure crossover vs triangle count (VERDICT r3 item 2).

The reference's uniform grid exists so render cost does not scale linearly
in triangle count (Myobj.cpp:110-162, 334-474). This repo's counterparts:

  - all_pairs: tiled MXU brute force (production default — wins at the
    bundled scenes' ~3k-triangle scale),
  - all_pairs + lane sort + tri-tile culling (ordered traversal with
    early exit — the TPU-native analogue of grid traversal),
  - grid: CSR uniform grid + batched 3D-DDA (ops/grid.py — the literal
    C10/C12 counterpart).

This script authors veach-mis variants at ~3k/10k/30k/100k triangles
(scene/authoring.py tess knob — same geometry, finer tessellation) and
measures, on the real device:

  A. end-to-end regen renders (uncached loop, 512^2 x 2 spp) for
     all_pairs vs all_pairs+sort+cull   -> the production crossover;
  B. one fixed-depth render_rays batch (32k camera rays, max_depth 4)
     for all_pairs vs grid              -> extends
     docs/tpu_grid_vs_allpairs.json across scales.

Writes docs/tpu_scale_crossover.json. The accel='auto' dispatch policy
(utils/config.py / ops/intersect.py) is derived from this artifact.
"""

import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

CONFIGS = [(1.0, 1), (1.8, 2), (3.2, 2), (5.9, 3)]
RES = 512
SPP = 2
LANES = 1 << 15


def author(tess, subdiv):
    from monte_carlo_path_tracing_tpu.scene import authoring, load_scene

    d = tempfile.mkdtemp(prefix=f"veach_t{tess}_")
    authoring.write_scene(
        authoring.author_veach_mis(tess, subdiv), d
    )
    scene = load_scene(os.path.join(d, "veach-mis.obj"))
    return dataclasses.replace(
        scene,
        camera=dataclasses.replace(scene.camera, width=RES, height=RES),
    )


def time_regen(scene, cfg, reps=2):
    from monte_carlo_path_tracing_tpu.core import rng
    from monte_carlo_path_tracing_tpu.integrator.regen import render_regen

    n_pix = RES * RES
    key = rng.base_key(0)
    fn = jax.jit(
        lambda sc, k, tot: render_regen(sc, cfg, k, n_pix, tot, lanes=LANES)
    )
    np.asarray(fn(scene, key, jnp.int32(LANES))[0])     # warm
    best = 1e9
    rays = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        fb, nrays, _, _ = fn(scene, key, jnp.int32(n_pix * SPP))
        np.asarray(fb)
        best = min(best, time.perf_counter() - t0)
        rays = float(nrays)
    return best, rays


def time_fixed(scene, cfg, reps=2):
    from monte_carlo_path_tracing_tpu.core import rng
    from monte_carlo_path_tracing_tpu.integrator import render_rays
    from monte_carlo_path_tracing_tpu.render.camera import generate_rays

    n = LANES
    idx = jnp.arange(n, dtype=jnp.int32)
    ro, rd = generate_rays(scene.camera, idx)
    key = rng.base_key(0)
    accel = None
    if cfg.accel == "grid":
        from monte_carlo_path_tracing_tpu.ops import grid as grid_mod

        accel = grid_mod.build_grid(scene, n0=cfg.grid_n0)
    fn = jax.jit(
        lambda sc, k, o, d: render_rays(
            sc, cfg, k, o, d, with_stats=True, accel=accel
        )
    )
    out = fn(scene, key, ro, rd)
    np.asarray(out[0])                                   # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(scene, key, ro, rd)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, float(out[1]["rays"])


def main():
    from monte_carlo_path_tracing_tpu.ops import intersect as ops_intersect
    from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

    report = {"device": str(jax.devices()[0]), "res": RES, "spp": SPP,
              "lanes": LANES, "rows": []}
    grid_gave_up = False
    for tess, subdiv in CONFIGS:
        scene = author(tess, subdiv)
        T = scene.num_tris
        row = {"tess": tess, "tris": int(T)}
        base = RenderConfig(
            width=RES, height=RES, spp=SPP, estimator="mis",
            light_sampler="spherical_triangle", max_depth=16, seed=0,
            primary_cache=False,
        )

        dt, rays = time_regen(scene, base)
        row["regen_all_pairs_s"] = round(dt, 3)
        row["regen_all_pairs_mrays"] = round(rays / dt / 1e6, 3)

        try:
            ops_intersect.CULL_NEAREST = True
            ops_intersect.CULL_OCCLUDED = True
            dt, rays = time_regen(scene, base.replace(ray_sort=True))
            row["regen_sort_cull_s"] = round(dt, 3)
            row["regen_sort_cull_mrays"] = round(rays / dt / 1e6, 3)
        except Exception as e:
            # The culled (resident) kernel holds ALL W tiles in VMEM and
            # tops out around ~100k triangles — record the wall honestly.
            row["regen_sort_cull_error"] = str(e).splitlines()[0][:200]
        finally:
            ops_intersect.CULL_NEAREST = False
            ops_intersect.CULL_OCCLUDED = False

        fdt, frays = time_fixed(scene, base.replace(max_depth=4))
        row["fixed_all_pairs_s"] = round(fdt, 3)
        row["fixed_all_pairs_mrays"] = round(frays / fdt / 1e6, 3)
        if not grid_gave_up:
            gdt, grays = time_fixed(
                scene, base.replace(max_depth=4, accel="grid")
            )
            row["fixed_grid_s"] = round(gdt, 3)
            row["fixed_grid_mrays"] = round(grays / gdt / 1e6, 3)
            if gdt > 50.0:
                grid_gave_up = True      # don't burn hours on larger T
                row["grid_note"] = "grid >50s at this scale; larger skipped"

        print(json.dumps(row), flush=True)
        report["rows"].append(row)

    with open(os.path.join(HERE, "docs", "tpu_scale_crossover.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("written docs/tpu_scale_crossover.json", flush=True)


if __name__ == "__main__":
    main()
