#!/usr/bin/env python
"""TPU experiment batch: kernel-v2 validation + precision sweep + MIS pass
+ regen mini-bench, all in one process (tunnel connect is expensive)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig
from monte_carlo_path_tracing_tpu.ops import intersect_pallas as ip


from monte_carlo_path_tracing_tpu.utils.timing import timed  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    accel = ops.build_accel(scene)
    N = 1 << 16
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    sc = dataclasses.replace(scene, camera=cam)
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro, rd = generate_rays(cam, idx)
    t_max = jnp.full((N,), 10.0)

    f_mat = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="matmul"))
    t_ref_ms, h_ref = timed(f_mat, ro, rd, n=5)

    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        ip.MATMUL_PRECISION = getattr(jax.lax.Precision, prec)
        ip._call_nearest.clear_cache()
        ip._call_occluded.clear_cache()
        f_pal = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="pallas"))
        t_pal, h_pal = timed(f_pal, ro, rd)
        same_v = (np.asarray(h_pal.valid) == np.asarray(h_ref.valid)).mean()
        m = np.asarray(h_pal.valid) & np.asarray(h_ref.valid)
        same_id = (np.asarray(h_pal.tri_id)[m] == np.asarray(h_ref.tri_id)[m]).mean()
        dt = np.abs(np.asarray(h_pal.t)[m] - np.asarray(h_ref.t)[m]).max() if m.any() else -1
        print(f"nearest[{prec}]: {t_pal*1e3:.2f} ms ({N/t_pal/1e6:.1f} Mray/s) "
              f"valid={same_v:.6f} id={same_id:.6f} max|dt|={dt:.2e}", flush=True)

        f_occ = jax.jit(lambda o, d, t: ops.occluded(accel, o, d, t, impl="pallas"))
        t_occ, occ = timed(f_occ, ro, rd, t_max)
        occ_ref = np.asarray(h_ref.valid) & (np.asarray(h_ref.t) < 10.0 * (1 - 1e-3))
        agree = (np.asarray(occ) == occ_ref).mean()
        print(f"occluded[{prec}]: {t_occ*1e3:.2f} ms ({N/t_occ/1e6:.1f} Mray/s) "
              f"agree={agree:.6f}", flush=True)

    # settle on HIGH if it was exact-enough, else HIGHEST
    ip.MATMUL_PRECISION = jax.lax.Precision.HIGHEST
    ip._call_nearest.clear_cache()
    ip._call_occluded.clear_cache()

    # regen mini-bench at 512^2 (fast compile reuse not possible across res)
    cfg = RenderConfig(spp=8, estimator="mis", light_sampler="spherical_triangle",
                       max_depth=16)
    cam2 = dataclasses.replace(scene.camera, width=512, height=512)
    sc2 = dataclasses.replace(scene, camera=cam2)
    n_pix = 512 * 512
    run = jax.jit(lambda s, k, tot: render_regen(s, cfg, k, n_pix, tot, lanes=N))
    key = jax.random.key(0)
    np.asarray(run(sc2, key, jnp.int32(N))[0])
    t0 = time.perf_counter()
    fb, nrays, iters, _ = run(sc2, key, jnp.int32(n_pix * 8))
    np.asarray(fb)
    dt = time.perf_counter() - t0
    print(f"regen 512^2x8spp: {dt:.2f}s  {int(nrays)/dt/1e6:.2f} Mrays/s  "
          f"{n_pix*8/dt/1e3:.0f} kpaths/s  iters={int(iters)}", flush=True)


if __name__ == "__main__":
    main()
