"""Fused Pallas TPU kernel for Arvo spherical-triangle light SELECTION.

``light_spherical.prepare`` + the inverse-CDF pick is the hot [N, L] pass of
every NEE vertex (reference Mylight.cpp:322-438): per (shading point, light
triangle) it evaluates the Van Oosterom-Strackee solid angle, culls, weights
by emitted radiance, and draws one triangle per point. The jnp formulation
is already matmul-shaped (two [N,3] @ [3,*] contractions, see
``light_spherical.prepare``), but XLA materializes the [N,5L] / [N,3L] / cdf
intermediates in HBM — measured 2.5 ms of a 13.2 ms regen iteration at 32k
lanes x 320 light triangles (veach). This kernel keeps the whole field in
VMEM per 256-ray tile and writes only the [N] outputs (picked index +
weight sum): the [N, L] field never touches HBM.

Mosaic has no atan2 or cumsum lowering, so both are built in-kernel:

- atan2(y, x) with y >= 0 (y = |det| here) by range reduction
  r = min(y,|x|)/max(y,|x|) in [0,1] and a degree-8 odd minimax polynomial
  (max abs error 1.2e-8 over [0,1] — below f32 ulp at pi/4; validated in
  tests/test_arvo_pallas.py against np.arctan2).
- the CDF by a Kogge-Stone log-shift scan over the lane axis
  (``pltpu.roll`` + masked adds, exact f32 adds, monotone by construction).

The summation ORDER of the scan differs from ``jnp.cumsum``'s, so a pick can
land one index off the jnp path's when the uniform falls within rounding of
a CDF boundary (~1e-7 probability class, same as the mxu_fast accept
fringe); the regen renderer therefore uses this kernel only where the jnp
path is not the parity oracle (TPU backend / interpret tests that opt in).

The selection pdf stays approximately self-consistent: ``pdf = l_sum /
wsum`` is evaluated from this kernel's own ``wsum`` output. The measured
accuracy of the kernel's solid angles / wsum vs the f64 oracle is ~4e-4
relative worst-case (f32 cancellation in the Van Oosterom–Strackee
denominator; tests/test_arvo_pallas.py asserts rtol=1e-3), and MIS
weighting mixes this wsum with jnp-computed solid angles in pdf_of_tri
(integrator/regen.py), so the self-consistency argument holds only to that
~4e-4 class — still far below the per-sample MC noise at any practical
spp (docs/tpu_dotmode_variance.json's image-level methodology applies).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monte_carlo_path_tracing_tpu.core import vecmath as vm
from monte_carlo_path_tracing_tpu.core.radiometry import radiance_sum

#: Geometric cull epsilon — MUST match light_spherical.EPS.
_EPS = 1e-6

_RT = 256  # rays per tile: [RT, 5*Lp] temporaries stay well under VMEM

# atan(r) = r * P(r^2), r in [0,1]; degree-8 least-squares fit at Chebyshev
# nodes, max abs error 1.2e-8 (generated offline; pinned by tests).
_ATAN_COEF = (
    0.9999999842105258, -0.3333306664040739, 0.1999248180835418,
    -0.14202560603427586, 0.10636725131767759, -0.0749539834997021,
    0.04258718300726191, -0.016004835213787556, 0.002834029467940735,
)


def _atan2_pos(y, x):
    """atan2(y, x) for y >= 0 (result in [0, pi]), Mosaic-lowerable."""
    ax = jnp.abs(x)
    mn = jnp.minimum(y, ax)
    mx = jnp.maximum(y, ax)
    r = mn / jnp.maximum(mx, 1e-30)
    s = r * r
    p = jnp.float32(_ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        p = p * s + jnp.float32(c)
    a = r * p
    a = jnp.where(y > ax, jnp.float32(0.5 * math.pi) - a, a)
    return jnp.where(x < 0.0, jnp.float32(math.pi) - a, a)


def pack_consts(scene):
    """Static per-light-triangle coefficient arrays, padded to a multiple
    of 128 triangles (padding rows carry l_sum = 0 => weight 0, never
    picked). Loop-invariant: XLA hoists the build out of bounce loops.

    Returns (Wx [3,5Lp], Wn [3,3Lp], rowc [8,Lp], lsum [1,Lp], L, Lp)."""
    pa, pb, pc = scene.light_verts()                     # [L,3]
    nl = scene.geo_n[scene.light_tri_ids]
    l_sum = radiance_sum(scene.light_emission())
    L = pa.shape[0]
    Lp = ((L + 127) // 128) * 128
    pad = Lp - L

    def padl(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    pa_, pb_, pc_, nl_ = padl(pa), padl(pb), padl(pc), padl(nl)
    crs = jnp.cross(pa_, pb_) + jnp.cross(pb_, pc_) + jnp.cross(pc_, pa_)
    Wx = jnp.concatenate([pa_, pb_, pc_, crs, nl_], axis=0).T    # [3, 5Lp]
    Wn = jnp.concatenate([pa_, pb_, pc_], axis=0).T              # [3, 3Lp]
    rowc = jnp.stack([
        vm.dot(pa_, pb_), vm.dot(pb_, pc_), vm.dot(pc_, pa_),
        vm.dot(pa_, pa_), vm.dot(pb_, pb_), vm.dot(pc_, pc_),
        vm.dot(nl_, pa_), vm.det3(pa_, pb_, pc_),
    ])                                                           # [8, Lp]
    lsum = padl(l_sum)[None, :]                                  # [1, Lp]
    return Wx, Wn, rowc, lsum, L, Lp


def _kernel(x_ref, n_ref, u_ref, wx_ref, wn_ref, rc_ref, ls_ref,
            idx_ref, wsum_ref, *, Lp: int, L: int):
    x = x_ref[...]                      # [RT, 3]
    nn = n_ref[...]
    u = u_ref[...]                      # [RT, 1]
    Wx = wx_ref[...]                    # [3, 5Lp]
    Wn = wn_ref[...]                    # [3, 3Lp]
    rc = rc_ref[...]                    # [8, Lp]
    ls = ls_ref[...]                    # [1, Lp]

    X = (x[:, 0:1] * Wx[0:1] + x[:, 1:2] * Wx[1:2] + x[:, 2:3] * Wx[2:3])
    Nv = (nn[:, 0:1] * Wn[0:1] + nn[:, 1:2] * Wn[1:2] + nn[:, 2:3] * Wn[2:3])
    xa, xb, xc = X[:, :Lp], X[:, Lp:2 * Lp], X[:, 2 * Lp:3 * Lp]
    xcrs, xnl = X[:, 3 * Lp:4 * Lp], X[:, 4 * Lp:]
    na_, nb_, nc_ = Nv[:, :Lp], Nv[:, Lp:2 * Lp], Nv[:, 2 * Lp:]

    xx = jnp.sum(x * x, axis=1, keepdims=True)          # [RT, 1]
    nx = jnp.sum(nn * x, axis=1, keepdims=True)

    ab = rc[0:1] - xa - xb + xx
    bc = rc[1:2] - xb - xc + xx
    ca = rc[2:3] - xc - xa + xx
    la = jnp.sqrt(jnp.maximum(rc[3:4] - 2.0 * xa + xx, 1e-20))
    lb = jnp.sqrt(jnp.maximum(rc[4:5] - 2.0 * xb + xx, 1e-20))
    lc = jnp.sqrt(jnp.maximum(rc[5:6] - 2.0 * xc + xx, 1e-20))

    det = rc[7:8] - xcrs
    denom = la * lb * lc + ab * lc + bc * la + ca * lb
    sA = 2.0 * _atan2_pos(jnp.abs(det), denom)

    front = (xnl - rc[6:7]) > _EPS
    above = ((na_ - nx) > _EPS) | ((nb_ - nx) > _EPS) | ((nc_ - nx) > _EPS)
    valid = front & above & (sA > _EPS)
    w = jnp.where(valid, sA * ls, 0.0)                  # [RT, Lp]

    # Kogge-Stone inclusive scan along lanes (exact f32, monotone).
    col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    cdf = w
    shift = 1
    while shift < Lp:
        cdf = cdf + jnp.where(col >= shift, pltpu.roll(cdf, shift, 1), 0.0)
        shift *= 2
    wsum = cdf[:, Lp - 1:Lp]                            # [RT, 1]

    thresh = u * wsum
    idx = jnp.sum((cdf <= thresh).astype(jnp.int32), axis=1, keepdims=True)
    idx_ref[...] = jnp.minimum(idx, L - 1)
    wsum_ref[...] = wsum


@functools.partial(jax.jit, static_argnames=("L", "Lp", "interpret"))
def _call(x1, n, u, Wx, Wn, rowc, lsum, L: int, Lp: int, interpret: bool):
    N = x1.shape[0]
    padN = (-N) % _RT
    if padN:
        z = jnp.zeros((padN, 3), x1.dtype)
        x1 = jnp.concatenate([x1, z])
        n = jnp.concatenate([n, jnp.concatenate(
            [jnp.zeros((padN, 2)), jnp.ones((padN, 1))], axis=1)])
        u = jnp.concatenate([u, jnp.zeros((padN,), u.dtype)])
    Np = x1.shape[0]
    col = lambda i: (i, 0)
    full = lambda i: (0, 0)
    idx, wsum = pl.pallas_call(
        functools.partial(_kernel, Lp=Lp, L=L),
        grid=(Np // _RT,),
        in_specs=[
            pl.BlockSpec((_RT, 3), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((_RT, 3), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((_RT, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 5 * Lp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * Lp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Lp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_RT, 1), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((_RT, 1), col, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x1, n, u[:, None], Wx, Wn, rowc, lsum)
    return idx[:N, 0], wsum[:N, 0]


def arvo_select(scene, x1, n, u):
    """Fused projected-solid-angle weighting + inverse-CDF triangle pick.

    Equivalent to ``prepare(scene, x1, n)`` followed by
    ``pick_weighted``-style selection with uniform ``u`` [N] (up to
    summation-order rounding at CDF boundaries; see module docstring).
    Returns (light_idx [N] i32, weights_sum [N] f32)."""
    Wx, Wn, rowc, lsum, L, Lp = pack_consts(scene)
    # Interpret everywhere except a real TPU: a forced --fused-arvo on any
    # other backend (e.g. GPU) must not try to lower a pltpu kernel.
    interpret = jax.default_backend() != "tpu"
    return _call(x1, n, u, Wx, Wn, rowc, lsum, L, Lp, interpret)
