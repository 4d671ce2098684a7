"""Arvo spherical-triangle light sampling (reference Mylight.cpp:163-493, C9).

Per shading point (x1, n), every light triangle is projected onto the unit
sphere at x1; a triangle is drawn with weight = spherical_area * L.sum() and
a direction is sampled uniformly inside it by Arvo's (1995, §5.2) sub-area
inversion. The returned pdf is the **solid-angle density**
p(w) = L_i.sum() / sum_k(weight_k) — constant per triangle (Mylight.cpp:317).

TPU-native form: the per-(ray, light-tri) projection is one batched [N, L]
elementwise pass (culls as masks, acos chains clamped for f32 — SURVEY.md §7
hard part 3); the reference's O(L) *loop per shading point* (the reason its
spherical-sampling render took ~1300 min, README.md:356-360) becomes pure
VPU work that XLA fuses. The reference's per-point mutable member cache
(prepared_... , Mylight.h:115-120) is replaced by explicitly returned
``weights_sum`` that the wavefront integrator carries to the next bounce for
MIS pdf evaluation (eval_spherical_triangle_sampling_pdf, Mylight.cpp:484-493).

Reference culls replicated exactly (Mylight.cpp:340-413):
  - x1 on or behind the light's plane (vote-oriented normal nl)
  - light entirely on or below the tangent plane of n
  - degenerate spherical edges/angles (< eps), sA < 0, non-finite weights
Winding is fixed by the reference's cross-product test against the shading
normal: if ((C-A) x (B-A)) . n < 0 then swap B and C (Mylight.cpp:205-211).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.core import rng, vecmath as vm
from monte_carlo_path_tracing_tpu.core.radiometry import radiance_sum
from monte_carlo_path_tracing_tpu.sampling.light_uniform import LightSample
from monte_carlo_path_tracing_tpu.scene.types import Scene

#: Geometric cull epsilon. The reference uses 1e-8 in f64 (vec.h:7); f32
#: needs a larger floor for the acos chains near degenerate triangles.
EPS = 1e-6
_CLAMP = 1.0 - 1e-7


def _acos_c(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.arccos(jnp.clip(x, -_CLAMP, _CLAMP))


def project(x1, n, pa, pb, pc, nl):
    """Project light triangle(s) (pa,pb,pc; geometric normal nl) onto the
    unit sphere at x1 with surface normal n. All inputs broadcast against
    each other with a trailing xyz axis.

    Returns dict with: valid, sA (spherical excess), alpha (angle at A),
    edge_c (arc AB), and the oriented unit directions A, B, C.
    """
    # Cull 1: x1 must be strictly in front of the light (Mylight.cpp:180-185).
    front = vm.dot(nl, x1 - pa) > EPS
    # Cull 2: some light vertex above the tangent plane (Mylight.cpp:187-197).
    above = (
        (vm.dot(n, pa - x1) > EPS)
        | (vm.dot(n, pb - x1) > EPS)
        | (vm.dot(n, pc - x1) > EPS)
    )

    A = vm.normalize(pa - x1)
    B0 = vm.normalize(pb - x1)
    C0 = vm.normalize(pc - x1)

    # Winding fix (Mylight.cpp:205-211): swap B,C if (C-A)x(B-A) . n < 0.
    swap = vm.dot(vm.cross(C0 - A, B0 - A), n) < 0.0
    B = jnp.where(swap[..., None], C0, B0)
    C = jnp.where(swap[..., None], B0, C0)

    # Spherical edge lengths (Mylight.cpp:215-222).
    a = _acos_c(vm.dot(B, C))
    b = _acos_c(vm.dot(A, C))
    c = _acos_c(vm.dot(A, B))
    edges_ok = (a > EPS) & (b > EPS) & (c > EPS)

    # Interior angles from edge-plane normals (Mylight.cpp:225-233).
    n_ba = vm.normalize(vm.cross(B, A))
    n_ac = vm.normalize(vm.cross(A, C))
    n_cb = vm.normalize(vm.cross(C, B))
    alpha = _acos_c(-vm.dot(n_ba, n_ac))
    beta = _acos_c(-vm.dot(n_cb, n_ba))
    gamma = _acos_c(-vm.dot(n_ac, n_cb))
    angles_ok = (alpha > EPS) & (beta > EPS) & (gamma > EPS)

    sA = alpha + beta + gamma - math.pi
    valid = front & above & edges_ok & angles_ok & (sA > 0.0) & jnp.isfinite(sA)
    return {
        "valid": valid, "sA": sA, "alpha": alpha, "edge_c": c,
        "A": A, "B": B, "C": C,
    }


def solid_angle_fast(x1, n, pa, pb, pc, nl):
    """(sA, valid) via Van Oosterom-Strackee: tan(sA/2) =
    |det[A B C]| / (1 + A.B + B.C + C.A) — ONE atan2 per (point, triangle)
    instead of the reference's six-acos Girard chain (Mylight.cpp:215-236),
    which is the hot [N, L] pass of every NEE vertex. Winding-independent
    (|det|); same front/horizon culls as :func:`project`."""
    front = vm.dot(nl, x1 - pa) > EPS
    above = (
        (vm.dot(n, pa - x1) > EPS)
        | (vm.dot(n, pb - x1) > EPS)
        | (vm.dot(n, pc - x1) > EPS)
    )
    A = vm.normalize(pa - x1)
    B = vm.normalize(pb - x1)
    C = vm.normalize(pc - x1)
    det = jnp.abs(vm.det3(A, B, C))
    denom = 1.0 + vm.dot(A, B) + vm.dot(B, C) + vm.dot(C, A)
    sA = 2.0 * jnp.arctan2(det, denom)
    valid = front & above & (sA > EPS) & jnp.isfinite(sA)
    return sA, valid


def light_table(scene: Scene) -> jnp.ndarray:
    """[L,16] packed per-light-triangle record: pa(3) pb(3) pc(3) nl(3)
    emission(3) l_sum(1). One gather per lane instead of ~6 (TPU gathers
    are slow; same packing trick as integrator.common.build_tri_table).
    Loop-invariant, so XLA hoists the build out of bounce loops; emission
    stays differentiable (plain gathers/concat from the material table)."""
    pa, pb, pc = scene.light_verts()
    nl = scene.geo_n[scene.light_tri_ids]
    em = scene.light_emission()
    l_sum = radiance_sum(em)
    return jnp.concatenate([pa, pb, pc, nl, em, l_sum[:, None]], axis=1)


def _project_for_warp(x1, n, pa, pb, pc):
    """Oriented directions + the exact quantities Arvo's warp consumes:
    (A, B, C, alpha, cos_c, sA) — per selected triangle only.

    Leaner than :func:`project`: cos_c = A.B needs no acos, sA comes from
    one Van Oosterom-Strackee atan2, leaving a single acos (alpha). The
    full Girard chain (6 acos, Mylight.cpp:215-236) remains in
    :func:`project` for the oracle/tests; culls are not needed here — the
    triangle was already selected with weight > 0 by :func:`prepare`.
    """
    A = vm.normalize(pa - x1)
    B0 = vm.normalize(pb - x1)
    C0 = vm.normalize(pc - x1)
    swap = vm.dot(vm.cross(C0 - A, B0 - A), n) < 0.0   # winding (Mylight.cpp:205-211)
    B = jnp.where(swap[..., None], C0, B0)
    C = jnp.where(swap[..., None], B0, C0)

    n_ba = vm.normalize(vm.cross(B, A))
    n_ac = vm.normalize(vm.cross(A, C))
    alpha = _acos_c(-vm.dot(n_ba, n_ac))
    cos_c = vm.dot(A, B)
    det = jnp.abs(vm.det3(A, B, C))
    denom = 1.0 + vm.dot(A, B) + vm.dot(B, C) + vm.dot(C, A)
    sA = 2.0 * jnp.arctan2(det, denom)
    return A, B, C, alpha, cos_c, sA


def prepare(scene: Scene, x1: jnp.ndarray, n: jnp.ndarray):
    """Batched 'prepared_for_lights_spherical_triangle_sampling'
    (Mylight.cpp:322-422): weights[N,L] and weights_sum[N].

    Quadratic-form expansion of the Van Oosterom-Strackee terms: every
    per-(point, light-tri) dot product is bilinear in (x1 or n) and static
    per-triangle data, so the whole [N, L] pass is two [N,3]@[3,*] matmuls
    plus elementwise math — no [N, L, 3] direction vectors ever exist
    (those HBM temps dominated the naive formulation's cost):

      a.b   = pa.pb - x1.pa - x1.pb + |x1|^2          (a = pa - x1 etc)
      |a|^2 = |pa|^2 - 2 x1.pa + |x1|^2
      det(a,b,c) = det(pa,pb,pc) - x1.(pa x pb + pb x pc + pc x pa)
      tan(sA/2) = |det(a,b,c)| / (la lb lc + (a.b) lc + (b.c) la + (c.a) lb)

    Culls are the same as :func:`solid_angle_fast` in expanded form.
    """
    pa, pb, pc = scene.light_verts()                     # [L,3] each
    nl = scene.geo_n[scene.light_tri_ids]                # [L,3]
    l_sum = radiance_sum(scene.light_emission())         # [L]

    # static per-triangle data (loop-invariant: XLA hoists out of bounce loops)
    det0 = vm.det3(pa, pb, pc)                           # [L]
    crs = jnp.cross(pa, pb) + jnp.cross(pb, pc) + jnp.cross(pc, pa)
    papb = vm.dot(pa, pb)
    pbpc = vm.dot(pb, pc)
    pcpa = vm.dot(pc, pa)
    sqa, sqb, sqc = vm.dot(pa, pa), vm.dot(pb, pb), vm.dot(pc, pc)
    nlpa = vm.dot(nl, pa)

    hp = jax.lax.Precision.HIGHEST
    # [N,3] @ [3, 5L]: x1 against (pa, pb, pc, crossum, nl)
    Wx = jnp.concatenate([pa, pb, pc, crs, nl], axis=0).T      # [3, 5L]
    X = jnp.einsum("ni,il->nl", x1, Wx, precision=hp)
    L = pa.shape[0]
    xa, xb, xc, xcrs, xnl = (X[:, k * L:(k + 1) * L] for k in range(5))
    # [N,3] @ [3, 3L]: shading normal against the triangle vertices
    Wn = jnp.concatenate([pa, pb, pc], axis=0).T
    Nv = jnp.einsum("ni,il->nl", n, Wn, precision=hp)
    na_, nb_, nc_ = (Nv[:, k * L:(k + 1) * L] for k in range(3))

    xx = vm.dot(x1, x1)[:, None]                         # [N,1]
    nx = vm.dot(n, x1)[:, None]

    ab = papb[None] - xa - xb + xx
    bc = pbpc[None] - xb - xc + xx
    ca = pcpa[None] - xc - xa + xx
    la = jnp.sqrt(jnp.maximum(sqa[None] - 2 * xa + xx, 1e-20))
    lb = jnp.sqrt(jnp.maximum(sqb[None] - 2 * xb + xx, 1e-20))
    lc = jnp.sqrt(jnp.maximum(sqc[None] - 2 * xc + xx, 1e-20))

    det = det0[None] - xcrs
    denom = la * lb * lc + ab * lc + bc * la + ca * lb
    sA = 2.0 * jnp.arctan2(jnp.abs(det), denom)

    front = (xnl - nlpa[None]) > EPS                     # nl.(x1 - pa) > eps
    above = (
        ((na_ - nx) > EPS) | ((nb_ - nx) > EPS) | ((nc_ - nx) > EPS)
    )
    valid = front & above & (sA > EPS) & jnp.isfinite(sA)

    weight = jnp.where(valid, sA * l_sum[None, :], 0.0)  # [N,L]
    weight = jnp.where(jnp.isfinite(weight), weight, 0.0)
    return weight, jnp.sum(weight, axis=-1)


def _arvo_warp(key, A, B, C, alpha, cos_c, sA):
    """Arvo §5.2 uniform sample of a spherical triangle (Mylight.cpp:289-297).

    ``cos_c`` is the cosine of the arc AB (= A.B — the warp never needs the
    angle itself). Returns unit direction P. Batched over leading axes.
    """
    N = A.shape[0]
    xi = rng.uniform(key, (N, 2))
    sA1 = xi[:, 0] * sA
    s = jnp.sin(sA1 - alpha)
    t = jnp.cos(sA1 - alpha)
    u = t - jnp.cos(alpha)
    v = s + jnp.sin(alpha) * cos_c
    denom = (v * s + u * t) * jnp.sin(alpha)
    denom = jnp.where(jnp.abs(denom) > 1e-20, denom, jnp.sign(denom) * 1e-20 + 1e-30)
    q = ((v * t - u * s) * jnp.cos(alpha) - v) / denom
    q = jnp.clip(q, -1.0, 1.0)

    # C1 = q*A + sqrt(1-q^2) * normalize(C - (C.A)A)
    c_perp = vm.normalize(C - vm.dot(C, A)[..., None] * A)
    C1 = q[..., None] * A + jnp.sqrt(jnp.maximum(1.0 - q * q, 0.0))[..., None] * c_perp

    z = 1.0 - xi[:, 1] * (1.0 - vm.dot(C1, B))
    z = jnp.clip(z, -1.0, 1.0)
    b_perp = vm.normalize(C1 - vm.dot(C1, B)[..., None] * B)
    P = z[..., None] * B + jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))[..., None] * b_perp
    return vm.normalize(P)


def sample(
    key: jax.Array, scene: Scene, x1: jnp.ndarray, n: jnp.ndarray,
    fused: bool = False,
):
    """Batched 'lights_spherical_triangle_sampling' (Mylight.cpp:424-482).

    Returns (LightSample, weights_sum[N]). pdf is a solid-angle density;
    rays with no projectable light triangle get the reference's dummy
    below-surface sample with pdf 1 and valid=False (Mylight.cpp:427-430).

    ``fused=True`` runs projection + pick as one Pallas kernel
    (ops/arvo_pallas.py — the [N, L] field never touches HBM; forward
    renderers only, the kernel is not differentiable). Both paths consume
    the SAME uniform from k_sel; picks agree except within f32 rounding of
    CDF boundaries (see the kernel's module docstring).
    """
    k_sel, k_warp = rng.fold_in(key, 0), rng.fold_in(key, 1)
    if fused:
        from monte_carlo_path_tracing_tpu.ops.arvo_pallas import arvo_select

        u = rng.uniform(k_sel, (x1.shape[0],))
        lidx, weights_sum = arvo_select(scene, x1, n, u)
    else:
        weights, weights_sum = prepare(scene, x1, n)
        # Inverse-CDF pick (one uniform per lane; all-zero rows are flagged
        # invalid via ``has`` below, whatever index they land on).
        lidx = rng.pick_weighted(k_sel, weights, x1.shape[0], weights_sum)
    return sample_from_pick(k_warp, scene, x1, n, lidx, weights_sum), weights_sum


def sample_from_pick(
    k_warp: jax.Array,
    scene: Scene,
    x1: jnp.ndarray,
    n: jnp.ndarray,
    lidx: jnp.ndarray,
    weights_sum: jnp.ndarray,
) -> LightSample:
    """Post-pick stage of :func:`sample`: Arvo-warp a direction inside the
    already-selected spherical triangle ``lidx`` and land the point on the
    flat triangle (Mylight.cpp:449-481). Split out so callers that already
    hold a pick — e.g. the primary-hit cache pre-pass, which reuses one
    per-pixel prepared CDF across all spp (integrator/regen.py) — share the
    exact code (and draws) of the one-shot path."""
    has = weights_sum > EPS

    rec = light_table(scene)[lidx]                       # [N,16] single gather
    pa_s, pb_s, pc_s = rec[:, 0:3], rec[:, 3:6], rec[:, 6:9]
    nl = rec[:, 9:12]
    em = rec[:, 12:15]
    l_sum_s = rec[:, 15]

    A, B, C, alpha, cos_c, sA = _project_for_warp(x1, n, pa_s, pb_s, pc_s)
    P = _arvo_warp(k_warp, A, B, C, alpha, cos_c, sA)

    # Land the point on the flat triangle: plane intersection along P
    # (the reference re-runs intersect_with_triangle, Mylight.cpp:311-317;
    # the plane form is the same t without the redundant inside test).
    denom = vm.dot(nl, P)
    t = vm.dot(nl, pa_s - x1) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    t = jnp.maximum(t, 0.0)

    pdf = jnp.where(has, l_sum_s / jnp.maximum(weights_sum, 1e-30), 1.0)
    # Detached sampling: the sampled point is a constant of differentiation
    # (see sampling/phong.py); emission stays attached for d/d(radiance).
    coord = jax.lax.stop_gradient(
        jnp.where(has[:, None], x1 + P * t[:, None], x1 - n)
    )

    return LightSample(
        coord=coord,
        light_idx=lidx,
        tri_id=scene.light_tri_ids[lidx],
        emission=jnp.where(has[:, None], em, 0.0),
        pdf=pdf,
        valid=has,
        nl=nl,
    )


def pdf_of_tri(
    scene: Scene,
    x1: jnp.ndarray,
    n: jnp.ndarray,
    light_idx: jnp.ndarray,
    weights_sum: jnp.ndarray,
) -> jnp.ndarray:
    """'eval_spherical_triangle_sampling_pdf' (Mylight.cpp:484-493): the
    solid-angle pdf this sampler assigns to directions hitting light
    triangle ``light_idx``, as seen from (x1, n) whose prepared
    ``weights_sum`` is supplied. Zero when the triangle was culled from the
    projected set (indiceMap miss) or nothing was projectable."""
    safe = jnp.clip(light_idx, 0, scene.num_lights - 1)
    rec = light_table(scene)[safe]                       # [N,16] single gather
    _, valid = solid_angle_fast(
        x1, n, rec[:, 0:3], rec[:, 3:6], rec[:, 6:9], rec[:, 9:12]
    )
    ok = valid & (light_idx >= 0) & (weights_sum > EPS)
    return jnp.where(ok, rec[:, 15] / jnp.maximum(weights_sum, 1e-30), 0.0)
