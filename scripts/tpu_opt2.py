#!/usr/bin/env python
"""TPU batch 2: occluded-kernel fix validation, precision sweep, regen
mini-bench; also trials the persistent compilation cache."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import dataclasses
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.ops import intersect_pallas as ip
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
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro, rd = generate_rays(cam, idx)
    t_max = jnp.full((N,), 10.0)

    # reference result for agreement checks (pallas HIGHEST, known-exact)
    f_near = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="pallas"))
    t_near, h_ref = timed(f_near, ro, rd, n=10)
    print(f"nearest[HIGHEST]: {t_near*1e3:.2f} ms", flush=True)
    occ_ref = np.asarray(h_ref.valid) & (np.asarray(h_ref.t) < 10.0 * (1 - 1e-3))

    f_occ = jax.jit(lambda o, d, t: ops.occluded(accel, o, d, t, impl="pallas"))
    t_occ, occ = timed(f_occ, ro, rd, t_max)
    agree = (np.asarray(occ) == occ_ref).mean()
    print(f"occluded[HIGHEST]: {t_occ*1e3:.2f} ms agree={agree:.6f}", flush=True)

    for prec in ("HIGH",):
        ip.MATMUL_PRECISION = getattr(jax.lax.Precision, prec)
        ip._call_nearest.clear_cache()
        ip._call_occluded.clear_cache()
        f2 = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="pallas"))
        t2, h2 = timed(f2, ro, rd, n=10)
        same_v = (np.asarray(h2.valid) == np.asarray(h_ref.valid)).mean()
        m = np.asarray(h2.valid) & np.asarray(h_ref.valid)
        same_id = (np.asarray(h2.tri_id)[m] == np.asarray(h_ref.tri_id)[m]).mean()
        dt_err = np.abs(np.asarray(h2.t)[m] - np.asarray(h_ref.t)[m])
        rel = dt_err / np.maximum(np.asarray(h_ref.t)[m], 1e-3)
        print(f"nearest[{prec}]: {t2*1e3:.2f} ms valid={same_v:.6f} "
              f"id={same_id:.6f} max_rel_t={rel.max():.2e}", flush=True)
        f2o = jax.jit(lambda o, d, t: ops.occluded(accel, o, d, t, impl="pallas"))
        t2o, occ2 = timed(f2o, ro, rd, t_max)
        agree2 = (np.asarray(occ2) == occ_ref).mean()
        print(f"occluded[{prec}]: {t2o*1e3:.2f} ms agree={agree2:.6f}", flush=True)

    ip.MATMUL_PRECISION = jax.lax.Precision.HIGHEST
    ip._call_nearest.clear_cache()
    ip._call_occluded.clear_cache()

    cfg = RenderConfig(spp=8, estimator="mis", light_sampler="spherical_triangle",
                       max_depth=16)
    n_pix = 512 * 512
    run = jax.jit(
        lambda s, k, tot: render_regen(s, cfg, k, n_pix, tot, lanes=N)
    )
    sc2 = dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=512, height=512)
    )
    key = jax.random.key(0)
    np.asarray(run(sc2, key, jnp.int32(N))[0])
    t0 = time.perf_counter()
    fb, nrays, iters, _ = run(sc2, key, jnp.int32(n_pix * 8))
    np.asarray(fb)
    dt = time.perf_counter() - t0
    print(f"regen 512^2x8spp: {dt:.2f}s  {int(nrays)/dt/1e6:.2f} Mrays/s  "
          f"{n_pix*8/dt/1e3:.0f} kpaths/s  iters={int(iters)}", flush=True)

    cache = os.environ["JAX_COMPILATION_CACHE_DIR"]
    n_entries = len(os.listdir(cache)) if os.path.isdir(cache) else 0
    print(f"compile cache entries: {n_entries} at {cache}", flush=True)


if __name__ == "__main__":
    main()
