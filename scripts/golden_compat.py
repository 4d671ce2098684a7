#!/usr/bin/env python
"""Render the full-compat golden images for side-by-side comparison with
the reference's committed BMPs — ALL FIVE experiment rows of the
reference's regression record (VERDICT r4 item 4).

Reference artifacts (read-only, not copied into this repo;
README.md:332-392 is the experiment log):
  exp_report/MIS 2倍视距1388min.bmp      MIS, 2x distance        -> mis_2x
  exp_report/MIS 1倍视距1125min.bmp      MIS, 1x distance        -> mis_1x
  exp_report/光源采样加brdf采样取平均...  split+uniform, 2x, 330m -> split_uniform_2x
  exp_report/光源采样(球面三角形采样)...  split+spherical, ~1300m -> split_spherical_2x
  exp_report/仅brdf采样60min.bmp         BRDF-only, 2x, 60 min   -> brdf_2x

Every row renders through the per-estimator compat stack (Q2 fov bug +
branch pdf Q4 + tone map (380, 0.25); MIS adds ref weights + blocker
recursion; split+spherical adds the Q3 measure bug the reference has in
`shade`) and writes docs/img/golden_<row>.png plus region statistics into
docs/golden_compat_stats.json. Scene assets are lost upstream (quirk
Q14), so the comparison is qualitative/statistical: layout, relative
emitter brightness, streak structure, variance ordering (README.md §9).

Env: GOLDEN_SPP (10), GOLDEN_W/H (1280/720), GOLDEN_LANES (2^16),
GOLDEN_ROWS (comma list to subset).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from monte_carlo_path_tracing_tpu.render import film
from monte_carlo_path_tracing_tpu.render.camera import push_back_camera
from monte_carlo_path_tracing_tpu.render.renderer import render_image_regen
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
IMG = os.path.join(HERE, "docs", "img")


def main():
    spp = int(os.environ.get("GOLDEN_SPP", "10"))
    W = int(os.environ.get("GOLDEN_W", "1280"))
    H = int(os.environ.get("GOLDEN_H", "720"))
    lanes = int(os.environ.get("GOLDEN_LANES", str(1 << 16)))

    # The golden-compat variant puts the emitter row inside the Q2 window
    # (scene/authoring.py::author_veach_mis_golden) so the compat renders
    # show the reference's defining composition: emitter discs + streak
    # bands (GOLDEN_SCENE=veach-mis reverts to the un-bugged-camera layout).
    scene_name = os.environ.get("GOLDEN_SCENE", "veach-mis-golden")
    scene0 = load_scene(os.path.join(HERE, "scenes", scene_name, "veach-mis.obj"))
    os.makedirs(IMG, exist_ok=True)

    # (row tag, estimator, light sampler, distance, extra cfg flags) — one
    # per reference experiment BMP (README.md:346-391). Q4 branch-pdf and
    # Q2 fov apply to every row; split+spherical adds the Q3 measure bug
    # (area-form G divided by the solid-angle pdf, main.cpp:313-314 — the
    # pairing is only buggy with the spherical sampler); split+uniform is
    # the measure-CORRECT pairing in the reference too.
    ROWS = [
        ("mis_2x", "mis", "spherical_triangle", 2.0,
         dict(ref_mis_weights=True, mis_blocker_compat=True)),
        ("mis_1x", "mis", "spherical_triangle", 1.0,
         dict(ref_mis_weights=True, mis_blocker_compat=True)),
        ("split_uniform_2x", "split", "uniform_area", 2.0, {}),
        ("split_spherical_2x", "split", "spherical_triangle", 2.0,
         dict(measure_bug_compat=True)),
        ("brdf_2x", "brdf", "spherical_triangle", 2.0, {}),
    ]
    only = os.environ.get("GOLDEN_ROWS")
    if only:
        keep = set(only.split(","))
        ROWS = [r for r in ROWS if r[0] in keep]

    try:
        with open(os.path.join(HERE, "docs", "golden_compat_stats.json")) as f:
            stats = json.load(f)
    except FileNotFoundError:
        stats = {}
    stats.update({"spp": spp, "w": W, "h": H})

    for tag, est, sampler, dist, flags in ROWS:
        cam = dataclasses.replace(
            scene0.camera, width=W, height=H, fov_bug_compat=True)
        if dist != 1.0:
            cam = push_back_camera(cam, dist)
        scene = dataclasses.replace(scene0, camera=cam)
        cfg = RenderConfig(
            width=W, height=H, spp=spp, estimator=est,
            light_sampler=sampler, max_depth=32, seed=0,
            fov_bug_compat=True, branch_pdf_compat=True, **flags,
        )
        t0 = time.perf_counter()
        r = render_image_regen(scene, cfg, lanes=lanes)
        dt = time.perf_counter() - t0
        path = os.path.join(IMG, f"golden_{tag}.png")
        film.write_image(path, r.image, 380.0, 0.25)
        img = r.image
        # tone-mapped pixel-value variance over the plate band (the
        # region the reference's §9 compares visually): the reference's
        # qualitative ordering is MIS < spherical < uniform.
        mapped = film.to_srgb_u8(img, 380.0, 0.25)
        band = mapped[H // 4 : 3 * H // 4].astype(np.float64)
        stats[tag] = {
            "seconds": round(dt, 1),
            "mean_radiance": float(img.mean()),
            # rows of the four emitters vs the plate region vs background
            "top_quarter_mean": float(img[: H // 4].mean()),
            "mid_half_mean": float(img[H // 4 : 3 * H // 4].mean()),
            "bottom_quarter_mean": float(img[3 * H // 4 :].mean()),
            "nonzero_frac": float((img.sum(-1) > 0).mean()),
            "band_pixel_std": float(band.std()),
        }
        print(tag, json.dumps(stats[tag]), flush=True)

    with open(os.path.join(HERE, "docs", "golden_compat_stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print("wrote docs/golden_compat_stats.json and docs/img/golden_*.png")


if __name__ == "__main__":
    main()
