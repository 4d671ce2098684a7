#!/usr/bin/env python
"""TPU: validate the Pallas intersect kernel vs the jnp matmul path, then
time both and a full MIS pass."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


from monte_carlo_path_tracing_tpu.utils.timing import timed  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    accel = ops.build_accel(scene)
    N = 1 << 16
    scene_small = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=256, height=256)
    )
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro, rd = generate_rays(scene_small.camera, idx)

    f_mat = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="matmul"))
    f_pal = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="pallas"))

    t_mat, h_mat = timed(f_mat, ro, rd)
    print(f"matmul intersect: {t_mat*1e3:.2f} ms "
          f"({N/t_mat/1e6:.1f} Mray/s)", flush=True)
    t_pal, h_pal = timed(f_pal, ro, rd)
    print(f"pallas intersect: {t_pal*1e3:.2f} ms "
          f"({N/t_pal/1e6:.1f} Mray/s)", flush=True)

    vm_, vp_ = np.asarray(h_mat.valid), np.asarray(h_pal.valid)
    agree = (vm_ == vp_).mean()
    m = vm_ & vp_
    same_id = (np.asarray(h_mat.tri_id)[m] == np.asarray(h_pal.tri_id)[m]).mean()
    dt = np.abs(np.asarray(h_mat.t)[m] - np.asarray(h_pal.t)[m]).max()
    print(f"valid agree: {agree:.6f}  id agree: {same_id:.6f}  max|dt|: {dt:.3e}",
          flush=True)

    # full MIS pass timing (pallas impl)
    for impl, label in ((False, "matmul"), (True, "pallas")):
        cfg = RenderConfig(spp=1, estimator="mis",
                           light_sampler="spherical_triangle", max_depth=16,
                           use_pallas=impl)
        f = jax.jit(lambda sc, k, o, d: render_rays(sc, cfg, k, o, d))
        t, _ = timed(f, scene_small, jax.random.key(0), ro, rd, n=5)
        print(f"MIS 16-depth pass [{label}]: {t*1e3:.1f} ms "
              f"({N/t/1e3:.0f} kpaths/s)", flush=True)


if __name__ == "__main__":
    main()
