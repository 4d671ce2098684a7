#!/usr/bin/env python
"""Render the full-compat golden images for side-by-side comparison with
the reference's committed BMPs (VERDICT round-2 missing item #2).

Reference artifacts (read-only, not copied into this repo):
  /root/reference/test.bmp                         MIS, 2x distance, 10 spp
  /root/reference/exp_report/MIS 1倍视距1125min.bmp  MIS, 1x distance
  /root/reference/exp_report/MIS 2倍视距1388min.bmp  MIS, 2x distance
  (README.md:332-392 is the experiment log.)

This renders the same configuration through the full compat stack —
--ref-mis-full (reference MIS weights + occluded-blocker recursion via the
work queue) + branch-pdf + Q2 fov bug + 2x distance + tone map (380, 0.25)
— and writes docs/img/golden_mis_{1x,2x}.png plus region statistics into
docs/GOLDEN.md's data file. Scene assets are lost upstream (quirk Q14,
.MISSING_LARGE_BLOBS), so the comparison is qualitative/statistical:
layout, relative emitter brightness, specular streak structure, and the
Q3/README.md:388 under-illumination note.

Env: GOLDEN_SPP (10), GOLDEN_W/H (1280/720), GOLDEN_LANES (2^16).
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
    stats = {"spp": spp, "w": W, "h": H}

    for tag, dist in (("2x", 2.0), ("1x", 1.0)):
        cam = dataclasses.replace(
            scene0.camera, width=W, height=H, fov_bug_compat=True)
        if dist != 1.0:
            cam = push_back_camera(cam, dist)
        scene = dataclasses.replace(scene0, camera=cam)
        cfg = RenderConfig(
            width=W, height=H, spp=spp, estimator="mis",
            light_sampler="spherical_triangle", max_depth=32, seed=0,
            fov_bug_compat=True, branch_pdf_compat=True,
            ref_mis_weights=True, mis_blocker_compat=True,
        )
        t0 = time.perf_counter()
        r = render_image_regen(scene, cfg, lanes=lanes)
        dt = time.perf_counter() - t0
        path = os.path.join(IMG, f"golden_mis_{tag}.png")
        film.write_image(path, r.image, 380.0, 0.25)
        img = r.image
        stats[tag] = {
            "seconds": round(dt, 1),
            "mean_radiance": float(img.mean()),
            # rows of the four emitters vs the plate region vs background
            "top_quarter_mean": float(img[: H // 4].mean()),
            "mid_half_mean": float(img[H // 4 : 3 * H // 4].mean()),
            "bottom_quarter_mean": float(img[3 * H // 4 :].mean()),
            "nonzero_frac": float((img.sum(-1) > 0).mean()),
        }
        print(tag, json.dumps(stats[tag]), flush=True)

    with open(os.path.join(HERE, "docs", "golden_compat_stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print("wrote docs/golden_compat_stats.json and docs/img/golden_mis_*.png")


if __name__ == "__main__":
    main()
