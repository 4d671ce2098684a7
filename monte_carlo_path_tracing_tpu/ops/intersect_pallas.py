"""Pallas TPU kernel: fused matmul-form ray-triangle nearest hit.

Same math as intersect_ref.intersect_matmul (det/u/v/t numerators =
[RT,10] @ [10,TT] dots on the MXU) but with the accept test and the running
min-t reduction fused in VMEM — the [N,T] candidate field never touches HBM.

Layout: per ray tile (grid dim 0) of RT=256 rays, the kernel loops over
triangle tiles of TT=512, doing four [RT,10]@[10,TT] dot products (one per
component; component-major layout avoids lane-strided extraction) and
folding each tile's best hit into an in-register carry.

The kernel runs in interpret mode off-TPU, which is how the CPU test suite
checks it bit-for-bit against the jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monte_carlo_path_tracing_tpu.ops.intersect_ref import (
    BIG_T, DET_EPS, Hit, NO_HIT, T_EPS, ray_features,
)

RAY_TILE = 256
TRI_TILE = 512

# Python-literal twins of intersect_ref's jnp sentinels (a pallas kernel may
# not capture traced constants).
_BIG_T = 3.0e38
_NO_HIT = -1


def _kernel(g_ref, w_ref, ids_ref, excl_ref,
            t_ref, id_ref, u_ref, v_ref,
            *, nb: int, t_eps: float):
    g = g_ref[...]                     # [RT, 10]
    excl = excl_ref[...]               # [RT, 1] i32
    RT = g.shape[0]

    def body(b, carry):
        bt, bid, bu, bv = carry
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        det = dot(g, w_ref[b, 0])      # [RT, TT]
        u_num = dot(g, w_ref[b, 1])
        v_num = dot(g, w_ref[b, 2])
        t_num = dot(g, w_ref[b, 3])
        ids = ids_ref[b]               # [TT] i32

        s = jnp.sign(det)
        adet = jnp.abs(det)
        up = u_num * s
        vp = v_num * s
        tp = t_num * s
        ok = (
            (adet > DET_EPS)
            & (up >= 0.0)
            & (vp >= 0.0)
            & (up + vp <= adet)
            & (tp > t_eps * adet)
            & (ids[None, :] != excl)
        )
        safe_det = jnp.where(adet > 0, det, 1.0)
        t = jnp.where(ok, t_num / safe_det, _BIG_T)

        tile_best = jnp.min(t, axis=1)                    # [RT]
        # one-hot of the (first) argmin lane, built without gathers
        idx = jnp.argmin(t, axis=1)                       # [RT]
        lanes = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        onehot = lanes == idx[:, None]
        pick = lambda x, fill: jnp.sum(jnp.where(onehot, x, fill), axis=1)
        inv_det = 1.0 / safe_det
        tile_id = pick(jnp.broadcast_to(ids[None, :], t.shape), 0)
        tile_u = pick(u_num * inv_det, 0.0)
        tile_v = pick(v_num * inv_det, 0.0)
        tile_ok = jnp.sum(jnp.where(onehot, ok.astype(jnp.int32), 0), axis=1) > 0

        better = tile_best < bt
        return (
            jnp.where(better, tile_best, bt),
            jnp.where(better & tile_ok, tile_id, bid),
            jnp.where(better, tile_u, bu),
            jnp.where(better, tile_v, bv),
        )

    init = (
        jnp.full((RT,), _BIG_T, jnp.float32),
        jnp.full((RT,), _NO_HIT, jnp.int32),
        jnp.zeros((RT,), jnp.float32),
        jnp.zeros((RT,), jnp.float32),
    )
    bt, bid, bu, bv = jax.lax.fori_loop(0, nb, body, init)
    t_ref[...] = bt[:, None]
    id_ref[...] = bid[:, None]
    u_ref[...] = bu[:, None]
    v_ref[...] = bv[:, None]


def _pack_blocks(W: jnp.ndarray, tri_ids: jnp.ndarray, tile: int):
    """[Tp,10,4] -> ([nb,4,10,tile] f32, [nb,tile] i32), padding to tile."""
    T = W.shape[0]
    pad = (-T) % tile
    if pad:
        W = jnp.concatenate([W, jnp.zeros((pad, 10, 4), W.dtype)], axis=0)
        tri_ids = jnp.concatenate(
            [tri_ids, jnp.full((pad,), NO_HIT - 1, jnp.int32)], axis=0
        )
    nb = W.shape[0] // tile
    Wb = W.reshape(nb, tile, 10, 4).transpose(0, 3, 2, 1)  # [nb,4,10,tile]
    return Wb, tri_ids.reshape(nb, tile)


@functools.partial(jax.jit, static_argnames=("t_eps", "interpret"))
def _call(ro, rd, W, tri_ids, exclude_id, t_eps: float, interpret: bool):
    N = ro.shape[0]
    g = ray_features(ro, rd)                               # [N,10]
    Wb, idb = _pack_blocks(W, tri_ids, TRI_TILE)
    nb = Wb.shape[0]

    padN = (-N) % RAY_TILE
    if padN:
        g = jnp.concatenate([g, jnp.zeros((padN, 10), g.dtype)], axis=0)
        exclude_id = jnp.concatenate(
            [exclude_id, jnp.full((padN,), NO_HIT, jnp.int32)], axis=0
        )
    Np = g.shape[0]
    grid = (Np // RAY_TILE,)

    out_shape = [
        jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        jax.ShapeDtypeStruct((Np, 1), jnp.float32),
    ]
    col = lambda i: (i, 0)
    t, tid, u, v = pl.pallas_call(
        functools.partial(_kernel, nb=nb, t_eps=t_eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_TILE, 10), col, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nb, 4, 10, TRI_TILE), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((nb, TRI_TILE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), col, memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(g, Wb, idb, exclude_id[:, None])

    t = t[:N, 0]
    tid = tid[:N, 0]
    u = u[:N, 0]
    v = v[:N, 0]
    valid = tid >= 0
    return Hit(
        t=jnp.where(valid, t, BIG_T),
        tri_id=jnp.where(valid, tid, NO_HIT),
        u=u, v=v, valid=valid,
    )


def intersect_pallas(ro, rd, W, tri_ids, exclude_id=None, t_eps=T_EPS):
    N = ro.shape[0]
    if exclude_id is None:
        exclude_id = jnp.full((N,), NO_HIT, jnp.int32)
    interpret = jax.default_backend() == "cpu"
    return _call(ro, rd, W, tri_ids, exclude_id, float(t_eps), interpret)
