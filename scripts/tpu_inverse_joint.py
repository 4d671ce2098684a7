#!/usr/bin/env python
"""configs[3] flagship artifact: joint 4-family inverse recovery on
veach-mis (kd + ks + shininess + light radiance, nothing frozen), at a
serious optimization budget, with committed before/target/after renders.

Round-2 run (docs/inverse_joint_recovery.json): 600 steps x 1024 rays ->
ks 0.30->0.088, ns_log 0.92->0.21, em_rel 0.5->0.10. This script scales the
budget (defaults: 1500 steps x 4096 rays, lr 0.06 cosine) to push each
family at least 2x further, and writes:
  - docs/inverse_joint_recovery.json   (metrics + config; losses thinned)
  - docs/img/inverse_{target,init,final}.png (the visual evidence)

Env knobs: INV_STEPS, INV_RAYS, INV_LR, INV_WH (e.g. "48x27"), INV_SPP.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.diff.inverse import recover_materials
from monte_carlo_path_tracing_tpu.render import film
from monte_carlo_path_tracing_tpu.render.renderer import render_image_regen
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
OUT = os.path.join(HERE, "docs", "inverse_joint_recovery.json")
IMG = os.path.join(HERE, "docs", "img")


def preview(scene, materials, path):
    """256x144 x 32spp regen render of the scene under `materials`."""
    sc = dataclasses.replace(
        scene.with_materials(materials),
        camera=dataclasses.replace(scene.camera, width=256, height=144),
    )
    cfg = RenderConfig(width=256, height=144, spp=32, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=8, seed=7)
    r = render_image_regen(sc, cfg, lanes=1 << 14)
    film.write_image(path, r.image, 380.0, 0.25)
    return float(r.image.mean())


def main():
    steps = int(os.environ.get("INV_STEPS", "1500"))
    rays = int(os.environ.get("INV_RAYS", "4096"))
    lr = float(os.environ.get("INV_LR", "0.06"))
    wh = os.environ.get("INV_WH", "48x27")
    spp = int(os.environ.get("INV_SPP", "1"))
    w, h = (int(x) for x in wh.split("x"))

    scene = load_scene(os.path.join(HERE, "scenes", "veach-mis", "veach-mis.obj"))
    scene = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=w, height=h))
    cfg = RenderConfig(spp=spp, estimator="mis", max_depth=3, seed=0)
    m = scene.materials
    init = dataclasses.replace(
        m,
        kd=jnp.clip(m.kd + 0.15 * (m.kd.sum(-1, keepdims=True) > 0), 0.02, 0.95),
        ks=jnp.clip(m.ks - 0.3 * (m.ks > 0), 0.0, 0.95),
        ns=m.ns * 0.4,
        emission=m.emission * 0.5,
    )

    os.makedirs(IMG, exist_ok=True)
    preview(scene, m, os.path.join(IMG, "inverse_target.png"))
    preview(scene, init, os.path.join(IMG, "inverse_init.png"))

    res = recover_materials(
        scene, init, cfg, steps=steps, lr=lr, rays_per_step=rays, seed=2,
        loss_clip=5.0,
        progress=lambda i, l: (i % 100 == 0) and print(
            f"step {i}: loss {l:.4f}", flush=True),
    )
    r = res.materials
    preview(scene, r, os.path.join(IMG, "inverse_final.png"))

    spec = np.asarray(m.ks).sum(1) > 0
    lit = np.asarray(m.emission).sum(1) > 0
    vis = (np.asarray(m.kd).sum(1) > 0) & ~lit
    mae = lambda a, b, k: float(np.abs(np.asarray(a) - np.asarray(b))[k].mean())
    out = {
        "kd": [mae(init.kd, m.kd, vis), mae(r.kd, m.kd, vis)],
        "ks": [mae(init.ks, m.ks, spec), mae(r.ks, m.ks, spec)],
        "ns_log": [
            float(np.abs(np.log(np.asarray(init.ns) / np.asarray(m.ns)))[spec].mean()),
            float(np.abs(np.log(np.asarray(r.ns) / np.asarray(m.ns)))[spec].mean()),
        ],
        "em_rel": [0.5, float((np.abs(
            np.asarray(r.emission).sum(1) - np.asarray(m.emission).sum(1)
        )[lit] / np.asarray(m.emission).sum(1)[lit]).mean())],
        "losses_every50": [round(x, 5) for x in res.losses[::50]],
        "loss_tail_mean": round(float(np.mean(res.losses[-100:])), 5),
        "steps": steps, "lr": lr, "rays": rays, "clip": 5.0,
        "schedule": "cosine", "scene": f"veach-mis {w}x{h}", "spp": spp,
        "depth": 3,
        "images": "docs/img/inverse_{target,init,final}.png (256x144x32spp)",
    }
    print(json.dumps({k: out[k] for k in ("kd", "ks", "ns_log", "em_rel")}))
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
