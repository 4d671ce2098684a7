"""Intersection engine: accel build + implementation dispatch.

The reference's acceleration structure is a uniform grid walked by 3D-DDA
(Myobj.cpp:78-162, 334-474). On TPU, data-dependent traversal defeats the
vector units, so the engine is an all-pairs tiled test in matmul form (see
intersect_ref.py for the math): at the reference's scene scale (~3k
triangles) brute force on the MXU beats any divergent traversal. The
"accel build" is therefore just packing each triangle's [10,4] coefficient
matrix (and padding to a tile multiple).

Implementations:
  - 'matmul': plain jnp einsum — XLA tiles it onto the MXU; works on CPU
    (tests/oracle) and TPU.
  - 'pallas': hand-tiled Pallas kernel streaming triangle tiles through
    VMEM with an in-register running min (intersect_pallas.py); TPU only.
  - 'auto': pallas on TPU, matmul elsewhere.

A second, lights-only accel serves the reference's
closet_ray_intersect_light_triangle (Myobj.cpp:476-622) — needed only in
`ref_mis_weights` compat mode (quirk Q11) where the MIS denominator queries
the nearest *light* triangle along a BRDF ray.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.ops import intersect_ref
from monte_carlo_path_tracing_tpu.ops.intersect_ref import (  # noqa: F401
    Hit, NO_HIT, T_EPS, pack_tri_matrix,
)
from monte_carlo_path_tracing_tpu.scene.types import Scene

#: Triangle tile size — last-dim lanes are 128; 4 outputs per triangle
#: (det,u,v,t) => 128 triangles per 512-lane tile group.
TRI_BLOCK = 512


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriAccel:
    W: jnp.ndarray        # [Tpad, 10, 4] packed coefficient matrices
    tri_ids: jnp.ndarray  # [Tpad] int32 global ids (padding rows: -2)


def _build(v0, e1, e2, ids, block: int) -> TriAccel:
    T = v0.shape[0]
    W = pack_tri_matrix(v0, e1, e2)
    pad = (-T) % block
    if pad:
        W = jnp.concatenate([W, jnp.zeros((pad, 10, 4), W.dtype)], axis=0)
        ids = jnp.concatenate([ids, jnp.full((pad,), -2, jnp.int32)], axis=0)
    # Geometry is not a differentiation target (materials/emission are);
    # make that explicit so the accel never drags grads through packing.
    return TriAccel(W=jax.lax.stop_gradient(W), tri_ids=ids)


def build_accel(scene: Scene, block: int = TRI_BLOCK) -> TriAccel:
    ids = jnp.arange(scene.num_tris, dtype=jnp.int32)
    return _build(scene.tri_v0, scene.tri_e1, scene.tri_e2, ids, block)


def build_light_accel(scene: Scene, block: int = TRI_BLOCK) -> TriAccel:
    """Accel restricted to emissive triangles (ids remain global tri ids)."""
    sel = scene.light_tri_ids
    return _build(
        scene.tri_v0[sel], scene.tri_e1[sel], scene.tri_e2[sel], sel, block
    )


def intersect(
    accel: TriAccel,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    exclude_id: jnp.ndarray | None = None,
    impl: str = "auto",
    t_eps: float = T_EPS,
    mode: str | None = None,
) -> Hit:
    """Nearest hit of N rays against the accel's triangle set.

    Self-intersection avoidance is by triangle-id exclusion (quirk Q8,
    Myobj.cpp:417), not ray offsetting. `mode` picks the pallas dot mode
    (intersect_pallas.DOT_MODE); ignored by the other impls.
    """
    from monte_carlo_path_tracing_tpu.ops import grid as grid_mod

    if isinstance(accel, grid_mod.GridAccel):
        return grid_mod.intersect_grid(accel, ro, rd, exclude_id, t_eps=t_eps)
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = "pallas" if on_tpu else "matmul"
    if impl == "pallas":
        from monte_carlo_path_tracing_tpu.ops import intersect_pallas

        return intersect_pallas.intersect_pallas(
            ro, rd, accel.W, accel.tri_ids, exclude_id, t_eps=t_eps, mode=mode
        )
    if impl == "matmul":
        return intersect_ref.intersect_matmul(
            ro, rd, accel.W, accel.tri_ids, exclude_id, t_eps=t_eps
        )
    raise ValueError(f"unknown intersect impl {impl!r}")


#: Relative margin for shadow-ray occlusion: a hit counts as blocking only
#: below t_max * (1 - margin), keeping the sampled light surface itself out.
OCCLUSION_MARGIN = 1e-3


def occluded(
    accel: TriAccel,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    t_max: jnp.ndarray,
    exclude_id: jnp.ndarray | None = None,
    impl: str = "auto",
    t_eps: float = T_EPS,
    mode: str | None = None,
) -> jnp.ndarray:
    """[N] bool: something blocks the segment ro -> ro + t_max*rd.

    The NEE visibility predicate. The reference computes a full nearest hit
    and requires it to be exactly the sampled light triangle
    (main.cpp:309-311); "no accepted hit closer than the sampled point" is
    the same predicate, and the pallas path evaluates it with a pure
    OR-reduction any-hit kernel (no extraction work).
    """
    from monte_carlo_path_tracing_tpu.ops import grid as grid_mod

    if isinstance(accel, grid_mod.GridAccel):
        hit = grid_mod.intersect_grid(accel, ro, rd, exclude_id, t_eps=t_eps)
        return hit.valid & (hit.t < t_max * (1.0 - OCCLUSION_MARGIN))
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "matmul"
    scaled = t_max * (1.0 - OCCLUSION_MARGIN)
    if impl == "pallas":
        from monte_carlo_path_tracing_tpu.ops import intersect_pallas

        if exclude_id is None:
            exclude_id = jnp.full((ro.shape[0],), NO_HIT, jnp.int32)
        return intersect_pallas.occluded_pallas(
            ro, rd, accel.W, accel.tri_ids, exclude_id, scaled, t_eps=t_eps,
            mode=mode,
        )
    hit = intersect_ref.intersect_matmul(
        ro, rd, accel.W, accel.tri_ids, exclude_id, t_eps=t_eps
    )
    return hit.valid & (hit.t < scaled)
