#!/usr/bin/env python
"""TPU: measure the tri-tile culling win (sorted rays + AABB masks) across
tile sizes, for primary-coherent and bounce-incoherent ray sets."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import monte_carlo_path_tracing_tpu.ops.intersect as ops
from monte_carlo_path_tracing_tpu.ops import intersect_pallas as ip
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.scene import load_scene


from monte_carlo_path_tracing_tpu.utils.timing import timed as _t30  # noqa: E402


def timed(fn, *args, n=30):
    return _t30(fn, *args, n=n)


def sort_rays(ro, rd):
    lo = ro.min(0)
    inv = 1.0 / np.maximum(np.asarray(ro.max(0) - lo), 1e-9)
    q = np.clip(((np.asarray(ro) - np.asarray(lo)) * inv * 31).astype(np.int64), 0, 31)
    key = (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
    oct_ = ((np.asarray(rd) > 0) * np.array([1, 2, 4])).sum(1).astype(np.int64)
    order = np.argsort((oct_ << 15) | key, kind="stable")
    return ro[order], rd[order]


def main():
    print("devices:", jax.devices(), flush=True)
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    scene = load_scene(os.path.join(here, "scenes", "veach-mis", "veach-mis.obj"))
    accel = ops.build_accel(scene)
    N = 1 << 16
    import dataclasses
    cam = dataclasses.replace(scene.camera, width=256, height=256)
    idx = jnp.arange(N, dtype=jnp.int32) % (256 * 256)
    ro_p, rd_p = generate_rays(cam, idx)        # coherent primaries
    rng = np.random.default_rng(0)
    v0 = np.asarray(scene.tri_v0)
    lo, hi = v0.min(0), v0.max(0)
    ro_b = jnp.asarray(rng.uniform(lo, hi, (N, 3)), jnp.float32)  # bounce-ish
    d = rng.normal(size=(N, 3))
    rd_b = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    ro_bs, rd_bs = sort_rays(ro_b, rd_b)

    W, ids = accel.W, accel.tri_ids
    alo, ahi = accel.aabb_lo, accel.aabb_hi
    excl = jnp.full((N,), ip.NO_HIT, jnp.int32)
    t_max = jnp.full((N,), 10.0)

    ref_hit = {}
    for tt in (1792, 896, 448, 256, 128):
        ip.TRI_TILE = tt
        ip._call_nearest.clear_cache()
        ip._call_occluded.clear_cache()
        for label, (ro, rd) in (
            ("primary", (ro_p, rd_p)),
            ("bounce-sorted", (ro_bs, rd_bs)),
        ):
            for cull in (False, True):
                kw = dict(aabb_lo=alo, aabb_hi=ahi) if cull else {}
                try:
                    f_n = jax.jit(lambda o, d_: ip.intersect_pallas(
                        o, d_, W, ids, excl, mode="mxu_fast", **kw))
                    t_n, h = timed(f_n, ro, rd)
                    f_o = jax.jit(lambda o, d_, t: ip.occluded_pallas(
                        o, d_, W, ids, excl, t, mode="mxu_fast", **kw))
                    t_o, occ = timed(f_o, ro, rd, t_max)
                except Exception as e:
                    print(f"tt={tt} {label} cull={cull} FAILED {str(e)[:150]}")
                    continue
                key = (tt, label)
                if not cull:
                    ref_hit[key] = (h, occ)
                    extra = ""
                else:
                    h0, occ0 = ref_hit[key]
                    same_t = np.allclose(
                        np.asarray(h.t)[np.asarray(h0.valid)],
                        np.asarray(h0.t)[np.asarray(h0.valid)], rtol=1e-5)
                    sv = (np.asarray(h.valid) == np.asarray(h0.valid)).mean()
                    so = (np.asarray(occ) == np.asarray(occ0)).mean()
                    # mask density (unmasked tile fraction)
                    lo_t, hi_t = ip._tile_aabbs(alo, ahi, ip._tri_tile(W.shape[0]))
                    g, (ro_pp, rd_pp) = ip._pad_rays(
                        jnp.zeros((N, 10)), [ro, rd], [0.0, 0.0])
                    _, te = ip._cull_masks(ro_pp, rd_pp, lo_t, hi_t,
                                           jnp.full((ro_pp.shape[0],), ip._BIG_T))
                    dens = float(jnp.mean(te < ip._BIG_T / 2))
                    extra = (f" | valid={sv:.6f} t_ok={same_t} occ={so:.6f}"
                             f" mask_density={dens:.3f}")
                print(f"tt={tt:5d} {label:14s} cull={int(cull)} "
                      f"nearest {t_n*1e3:6.2f} ms occluded {t_o*1e3:6.2f} ms"
                      f"{extra}", flush=True)


if __name__ == "__main__":
    main()
