#!/usr/bin/env python
"""BASELINE configs[2] at full scale: Veach MIS 1024x1024, 1024 spp, Arvo
spherical-triangle sampling + MIS, full bounce depth — the reference's
flagship configuration (its README logs 1388 minutes for 1280x720x10spp;
this runs 131x the sample count). Writes docs/configs2_veach_1024.json and
docs/img/veach_mis_1024_1024spp.png."""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from monte_carlo_path_tracing_tpu.render import film
from monte_carlo_path_tracing_tpu.render.renderer import render_image_regen
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    res = int(os.environ.get("C2_RES", "1024"))
    spp = int(os.environ.get("C2_SPP", "1024"))
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=res, height=res)
    )
    cfg = RenderConfig(
        width=res, height=res, spp=spp, estimator="mis",
        light_sampler="spherical_triangle", max_depth=32, seed=0,
    )
    t0 = time.time()
    r = render_image_regen(scene, cfg, lanes=1 << 16)
    wall = time.time() - t0
    img = r.image
    out_png = os.path.join(here, "docs", "img", f"veach_mis_{res}_{spp}spp.png")
    film.write_image(out_png, img, cfg.max_radiance, cfg.gamma)
    rec = {
        "config": "BASELINE configs[2]",
        "device": str(jax.devices()[0]),
        "res": res, "spp": spp, "estimator": "mis",
        "light_sampler": "spherical_triangle", "max_depth": 32,
        "render_seconds": round(r.seconds, 1),
        "wall_seconds_incl_compile": round(wall, 1),
        "rays_traced": r.rays_traced,
        "mrays_per_s": round(r.rays_traced / r.seconds / 1e6, 3),
        "paths_per_s": round(res * res * spp / r.seconds, 1),
        "mean_radiance": float(np.mean(img)),
        "png": os.path.relpath(out_png, here),
        "reference_comparison": (
            "reference MIS 1x: 1280x720x10spp in 67,500 s = 136 paths/s "
            "(BASELINE.md); this config renders 131x the samples"
        ),
    }
    with open(os.path.join(here, "docs", "configs2_veach_1024.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1), flush=True)


if __name__ == "__main__":
    main()
