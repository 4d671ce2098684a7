#!/usr/bin/env python
"""TPU microbenchmarks: attribute the regen per-iteration cost to its
stages (intersect, occlusion, NEE prepare+sample, BSDF sample, gathers,
framebuffer scatter)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.integrator import common
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.sampling import light_spherical, phong
from monte_carlo_path_tracing_tpu.scene import load_scene


from monte_carlo_path_tracing_tpu.utils.timing import timed as _timed  # noqa: E402


def timed(fn, *args, n=30):
    return _timed(fn, *args, n=n)[0]


def main():
    print("devices:", jax.devices(), flush=True)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    accel = ops.build_accel(scene)
    tri_to_light = common.light_index_table(scene)
    N = 1 << 16
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro, rd = generate_rays(cam, idx)
    key = jax.random.key(0)

    f_near = jax.jit(lambda o, d: ops.intersect(accel, o, d, impl="pallas"))
    hit = f_near(ro, rd)
    t = timed(f_near, ro, rd)
    print(f"nearest:        {t*1e3:7.2f} ms", flush=True)

    si = jax.jit(
        lambda h, d: common.gather_interaction(scene, h, d, tri_to_light)
    )(hit, rd)
    t = timed(jax.jit(lambda h, d: common.gather_interaction(scene, h, d, tri_to_light)), hit, rd)
    print(f"gather_si:      {t*1e3:7.2f} ms", flush=True)

    t_max = jnp.full((N,), 10.0)
    t = timed(jax.jit(lambda o, d, tm: ops.occluded(accel, o, d, tm, impl="pallas")), si.p, rd, t_max)
    print(f"occluded:       {t*1e3:7.2f} ms", flush=True)

    f_light = jax.jit(lambda k, p, n: light_spherical.sample(k, scene, p, n))
    t = timed(f_light, key, si.p, si.ns)
    print(f"arvo_sample:    {t*1e3:7.2f} ms", flush=True)

    f_prep = jax.jit(lambda p, n: light_spherical.prepare(scene, p, n))
    t = timed(f_prep, si.p, si.ns)
    print(f"arvo_prepare:   {t*1e3:7.2f} ms", flush=True)

    f_bsdf = jax.jit(
        lambda k, n, wo: phong.sample_brdf(k, n, wo, si.kd, si.ks, si.ns_exp)
    )
    t = timed(f_bsdf, key, si.ns, si.wo)
    print(f"phong_sample:   {t*1e3:7.2f} ms", flush=True)

    f_pdf = jax.jit(lambda n, wi, wo: phong.pdf_brdf(n, wi, wo, si.kd, si.ks, si.ns_exp))
    t = timed(f_pdf, si.ns, rd, si.wo)
    print(f"phong_pdf:      {t*1e3:7.2f} ms", flush=True)

    fb = jnp.zeros((1024 * 1024 + 1, 3))
    pix = jax.random.randint(key, (N,), 0, 1024 * 1024, dtype=jnp.int32)
    vals = jax.random.uniform(key, (N, 3))
    f_scat = jax.jit(lambda fb, p, v: fb.at[p].add(v))
    t = timed(f_scat, fb, pix, vals)
    print(f"fb_scatter:     {t*1e3:7.2f} ms", flush=True)

    f_vos = jax.jit(
        lambda p, n, lidx, ws: light_spherical.pdf_of_tri(scene, p, n, lidx, ws)
    )
    lidx = jnp.zeros((N,), jnp.int32)
    ws = jnp.ones((N,))
    t = timed(f_vos, si.p, si.ns, lidx, ws)
    print(f"pdf_of_tri:     {t*1e3:7.2f} ms", flush=True)

    # RNG draw cost: the regen body draws ~6 per-lane uniforms per iteration
    # (RR, 3x light select/warp, 2-3x bsdf). One (N,) threefry draw:
    f_rng1 = jax.jit(lambda k: jax.random.uniform(k, (N,)))
    t = timed(f_rng1, key)
    print(f"threefry (N,):  {t*1e3:7.2f} ms", flush=True)
    f_rng6 = jax.jit(lambda k: jax.random.uniform(k, (6, N)))
    t = timed(f_rng6, key)
    print(f"threefry (6,N): {t*1e3:7.2f} ms", flush=True)
    krbg = jax.random.key(0, impl="rbg")
    f_rbg = jax.jit(lambda k: jax.random.uniform(k, (6, N)))
    t = timed(f_rbg, krbg)
    print(f"rbg (6,N):      {t*1e3:7.2f} ms", flush=True)

    # Full regen iteration for scale (ms/iter at C=65536):
    from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
    from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=256, height=256, spp=8, estimator="mis",
                       light_sampler="spherical_triangle")
    f_regen = jax.jit(
        lambda k: render_regen(scene, cfg, k, 256 * 256, 256 * 256 * 8, lanes=N)
    )
    fb, nrays, iters, _ = f_regen(key)
    np.asarray(fb)
    t0 = time.perf_counter()
    fb, nrays, iters, _ = f_regen(key)
    np.asarray(fb)
    dt = time.perf_counter() - t0
    print(f"regen: {dt:.3f}s, {int(iters)} iters, {dt/int(iters)*1e3:.2f} ms/iter, "
          f"{float(nrays)/dt/1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
