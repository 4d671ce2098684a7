"""Shared per-vertex machinery for the wavefront integrators.

Surface interaction gather (the reference's barycentric interpolation +
facet-attribute cache reads, main.cpp:273-292 / Myobj.cpp:626-709), Russian
roulette, and the solid-angle light-pdf conversions used by MIS.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.core import vecmath as vm
from monte_carlo_path_tracing_tpu.ops.intersect_ref import Hit
from monte_carlo_path_tracing_tpu.scene.types import Scene


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceInteraction:
    """Everything the estimators read at a path vertex."""

    p: jnp.ndarray          # [N,3] hit position (barycentric lerp, main.cpp:273)
    ns: jnp.ndarray         # [N,3] interpolated unit shading normal (main.cpp:274)
    ng: jnp.ndarray         # [N,3] vote-oriented geometric normal
    wo: jnp.ndarray         # [N,3] toward the previous vertex (unit)
    kd: jnp.ndarray         # [N,3]
    ks: jnp.ndarray         # [N,3]
    ns_exp: jnp.ndarray     # [N] Phong exponent
    emission: jnp.ndarray   # [N,3]
    is_light: jnp.ndarray   # [N] bool
    front: jnp.ndarray      # [N] bool: ns . wo > 0 (backface => black, Q9)
    tri_id: jnp.ndarray     # [N]
    light_idx: jnp.ndarray  # [N] index into light arrays (-1 for non-lights)


def light_index_table(scene: Scene) -> jnp.ndarray:
    """[T] map tri_id -> light array index (-1 for non-lights) — replaces
    the reference's per-point indiceMap (Mylight.h:119, Mylight.cpp:418)."""
    table = jnp.full((scene.num_tris,), -1, jnp.int32)
    return table.at[scene.light_tri_ids].set(
        jnp.arange(scene.num_lights, dtype=jnp.int32)
    )


def gather_interaction(
    scene: Scene, hit: Hit, rd: jnp.ndarray, tri_to_light: jnp.ndarray
) -> SurfaceInteraction:
    tri = jnp.maximum(hit.tri_id, 0)  # clamp miss sentinel for safe gathers
    v0 = scene.tri_v0[tri]
    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]
    u = hit.u[:, None]
    v = hit.v[:, None]
    p = v0 + u * e1 + v * e2

    vn = scene.tri_vn[tri]                               # [N,3,3]
    ns = vm.normalize(
        (1.0 - u - v) * vn[:, 0] + u * vn[:, 1] + v * vn[:, 2]
    )
    wo = -rd
    mat = scene.tri_mat_id[tri]
    mats = scene.materials
    return SurfaceInteraction(
        p=p,
        ns=ns,
        ng=scene.geo_n[tri],
        wo=wo,
        kd=mats.kd[mat],
        ks=mats.ks[mat],
        ns_exp=mats.ns[mat],
        emission=mats.emission[mat],
        is_light=scene.is_light[tri] & hit.valid,
        front=vm.dot(ns, wo) > 0.0,
        tri_id=hit.tri_id,
        light_idx=jnp.where(hit.valid, tri_to_light[tri], -1),
    )


def russian_roulette(key: jax.Array, n: int, p_survive: float):
    """Survive mask + 1/p weight (reference ksi > 0.6 => stop,
    main.cpp:321-329)."""
    xi = jax.random.uniform(key, (n,))
    return xi < p_survive, 1.0 / p_survive


def area_pdf_to_solid_angle(
    pdf_area: jnp.ndarray, dist2: jnp.ndarray, cos_light: jnp.ndarray
) -> jnp.ndarray:
    """p(w) = p(A) * r^2 / cos(theta_light); zero when the light is seen
    edge-on or from behind."""
    ok = cos_light > 1e-7
    return jnp.where(ok, pdf_area * dist2 / jnp.maximum(cos_light, 1e-7), 0.0)
