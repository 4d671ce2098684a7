"""Uniform-grid acceleration structure + 3D-DDA traversal (C10/C12).

The reference builds a uniform grid over the scene AABB (cal_scene_boundingbox
/ meshing, Myobj.cpp:78-162) and walks it with a 3D-DDA
(closet_ray_intersect, Myobj.cpp:334-474). On TPU the production default
remains the all-pairs MXU formulation (ops/intersect.py) — at the
reference's ~3k-triangle scale a dense matmul beats divergent traversal by
orders of magnitude — but the grid is the right tool once T grows to the
point where T/ray work dominates, and it is the faithful counterpart of the
reference's accel for parity testing. This module implements it TPU-/JAX-
natively: a host-side CSR build (cells -> triangle lists) and a batched
`lax.while_loop` DDA in which every lane advances one cell per iteration.

Reference semantics preserved:
  - cell width d = max_extent / n0^(1/3)       (meshing, Myobj.cpp:119-120)
  - AABB optionally seeded with the camera position so eye rays start
    in-grid (quirk Q7, Myobj.cpp:85-88) — here generalised: rays starting
    outside are clamped forward to the grid entry by a slab test, so the
    seed is optional rather than load-bearing.
  - triangles inserted into every cell overlapped by their AABB
    (Myobj.cpp:129-159)
  - a hit is accepted only if the hit point lies in the current cell, which
    makes the first cell with an accepted hit globally nearest
    (Myobj.cpp:427-441); self-exclusion by triangle id (quirk Q8)
  - per-axis eps-aware step signs; DBL_MAX boundary params for
    sign==0 axes (Myobj.cpp:345-385)

Not reproduced: the light-only variant's buggy stepping (quirk Q10 — it
advances all near-min axes and misses the sign guard); the lights-only
query reuses this correct traversal over a lights-only grid.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.ops.intersect_ref import (
    BIG_T, DET_EPS, Hit, NO_HIT, T_EPS,
)
from monte_carlo_path_tracing_tpu.scene.types import Scene

_F32_MAX = np.float32(3.0e38)  # numpy, not jnp: keep import device-free


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridAccel:
    """CSR uniform grid. C = nx*ny*nz cells, M = total tri-cell pairs."""

    bmin: jnp.ndarray        # [3] grid origin (world)
    inv_w: jnp.ndarray       # scalar 1/cell_width
    cell_w: jnp.ndarray      # scalar cell width (meshing d, Myobj.cpp:119)
    cell_start: jnp.ndarray  # [C+1] int32 CSR offsets (x-major, z fastest)
    cell_tris: jnp.ndarray   # [M] int32 triangle ids
    v0: jnp.ndarray          # [T,3]
    e1: jnp.ndarray          # [T,3]
    e2: jnp.ndarray          # [T,3]
    dims: tuple = dataclasses.field(metadata=dict(static=True))  # (nx,ny,nz)


def build_grid(
    scene: Scene,
    n0: int = 100_000,
    include_point: np.ndarray | None = None,
    lights_only: bool = False,
    max_axis_cells: int = 103,
) -> GridAccel:
    """Host-side grid build (meshing, Myobj.cpp:110-162).

    n0 is the reference's target cell count (main.cpp:520 uses 100000);
    `include_point` reproduces the camera-seeded AABB (Q7);
    `lights_only` builds the C12 light-variant grid over emissive
    triangles only (global ids preserved).
    """
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    if lights_only:
        ids = np.asarray(scene.light_tri_ids, np.int32)
    else:
        ids = np.arange(v0.shape[0], dtype=np.int32)
    p0, p1, p2 = v0[ids], v0[ids] + e1[ids], v0[ids] + e2[ids]

    lo = np.minimum(np.minimum(p0, p1), p2)          # [K,3] per-tri AABB
    hi = np.maximum(np.maximum(p0, p1), p2)
    bmin = lo.min(axis=0)
    bmax = hi.max(axis=0)
    if include_point is not None:
        bmin = np.minimum(bmin, include_point)
        bmax = np.maximum(bmax, include_point)
    # tiny margin so boundary vertices land strictly inside
    span = np.maximum(bmax - bmin, 1e-6)
    bmin = bmin - 1e-4 * span
    bmax = bmax + 1e-4 * span
    extent = bmax - bmin

    d = float(extent.max()) / float(np.cbrt(n0))     # Myobj.cpp:119-120
    dims = np.clip(np.ceil(extent / d).astype(np.int64), 1, max_axis_cells)
    nx, ny, nz = (int(dims[0]), int(dims[1]), int(dims[2]))

    # Cell ranges overlapped by each triangle's AABB (Myobj.cpp:129-159).
    clo = np.clip(np.floor((lo - bmin) / d).astype(np.int64), 0, dims - 1)
    chi = np.clip(np.floor((hi - bmin) / d).astype(np.int64), 0, dims - 1)

    counts = np.zeros(nx * ny * nz, np.int64)
    spans = []
    for k in range(ids.shape[0]):
        xs = np.arange(clo[k, 0], chi[k, 0] + 1)
        ys = np.arange(clo[k, 1], chi[k, 1] + 1)
        zs = np.arange(clo[k, 2], chi[k, 2] + 1)
        cid = ((xs[:, None] * ny + ys[None, :])[:, :, None] * nz + zs).ravel()
        spans.append((cid, ids[k]))
        np.add.at(counts, cid, 1)
    start = np.zeros(nx * ny * nz + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    tris = np.empty(int(start[-1]), np.int32)
    cursor = start[:-1].copy()
    for cid, tid in spans:
        tris[cursor[cid]] = tid
        cursor[cid] += 1

    return GridAccel(
        bmin=jnp.asarray(bmin, jnp.float32),
        inv_w=jnp.float32(1.0 / d),
        cell_w=jnp.float32(d),
        cell_start=jnp.asarray(start, jnp.int32),
        cell_tris=jnp.asarray(tris, jnp.int32),
        v0=jax.lax.stop_gradient(scene.tri_v0),
        e1=jax.lax.stop_gradient(scene.tri_e1),
        e2=jax.lax.stop_gradient(scene.tri_e2),
        dims=(nx, ny, nz),
    )


def intersect_grid(
    grid: GridAccel,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    exclude_id: jnp.ndarray | None = None,
    t_eps: float = T_EPS,
    max_tris_per_cell: int = 512,
) -> Hit:
    """Nearest hit via batched 3D-DDA (closet_ray_intersect, Myobj.cpp:334-474).

    All N lanes march one cell per outer iteration; the outer while runs
    until every lane terminated (hit or left the grid). The inner loop scans
    each lane's CSR list one triangle per iteration up to the longest list
    among still-scanning lanes.
    """
    N = ro.shape[0]
    nx, ny, nz = grid.dims
    dims = jnp.array([nx, ny, nz], jnp.int32)
    if exclude_id is None:
        exclude_id = jnp.full((N,), NO_HIT, jnp.int32)

    eps = 1e-12
    # Entry clamp: advance origins outside the AABB to the grid boundary
    # (generalises Q7's camera-seeded AABB).
    bmax = grid.bmin + grid.cell_w * dims.astype(jnp.float32)
    safe_rd = jnp.where(jnp.abs(rd) < eps, jnp.where(rd < 0, -eps, eps), rd)
    t_lo = (grid.bmin[None, :] - ro) / safe_rd
    t_hi = (bmax[None, :] - ro) / safe_rd
    t_near = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t_far = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    inside = jnp.all((ro >= grid.bmin) & (ro <= bmax), axis=-1)
    t_entry = jnp.where(inside, 0.0, jnp.maximum(t_near, 0.0) + 1e-5)
    misses_grid = (~inside) & ((t_near > t_far) | (t_far < 0.0))

    p_start = ro + t_entry[:, None] * rd
    cell = jnp.clip(
        jnp.floor((p_start - grid.bmin[None, :]) * grid.inv_w).astype(jnp.int32),
        0, dims[None, :] - 1,
    )

    # Per-axis step signs with eps-zero handling (Myobj.cpp:345-353) and
    # next-boundary ray params (355-385; DBL_MAX when sign == 0).
    step = jnp.where(rd > eps, 1, jnp.where(rd < -eps, -1, 0)).astype(jnp.int32)
    next_plane = grid.bmin[None, :] + (
        cell + (step > 0).astype(jnp.int32)
    ).astype(jnp.float32) * grid.cell_w
    t_next = jnp.where(step != 0, (next_plane - ro) / safe_rd, _F32_MAX)
    dt = jnp.where(step != 0, grid.cell_w / jnp.abs(safe_rd), _F32_MAX)

    best_t = jnp.full((N,), BIG_T)
    best_id = jnp.full((N,), NO_HIT, jnp.int32)
    best_uv = jnp.zeros((N, 2))
    done = misses_grid

    max_steps = nx + ny + nz + 3

    def tri_test(tid, ro, rd):
        """Single-triangle Cramer test (intersect_with_triangle,
        Myobj.cpp:165-192) for a gathered triangle per lane."""
        a = grid.v0[tid]
        e1 = grid.e1[tid]
        e2 = grid.e2[tid]
        pvec = jnp.cross(rd, e2)
        det = jnp.sum(pvec * e1, axis=-1)
        inv = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
        tvec = ro - a
        u = jnp.sum(pvec * tvec, axis=-1) * inv
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(qvec * rd, axis=-1) * inv
        t = jnp.sum(qvec * e2, axis=-1) * inv
        ok = (
            (jnp.abs(det) > DET_EPS)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_eps)
        )
        return ok, t, u, v

    def body(st):
        cell, t_next, best_t, best_id, best_uv, done, it = st
        cid = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
        cid = jnp.clip(cid, 0, nx * ny * nz - 1)
        s = grid.cell_start[cid]
        e = grid.cell_start[cid + 1]

        # Scan this cell's triangle list (Myobj.cpp:414-445).
        def inner(inner_st):
            j, bt, bid, buv = inner_st
            scan = (~done) & (j < e)
            tid = grid.cell_tris[jnp.clip(j, 0, grid.cell_tris.shape[0] - 1)]
            ok, t, u, v = tri_test(tid, ro, rd)
            ok = ok & scan & (tid != exclude_id)
            # accept only if the hit point lies in the current cell
            # (Myobj.cpp:427-441) with a half-cell-boundary tolerance
            p = ro + t[:, None] * rd
            pc = jnp.floor((p - grid.bmin[None, :]) * grid.inv_w).astype(jnp.int32)
            in_cell = jnp.all(jnp.abs(pc - cell) <= 0, axis=-1) | (
                # boundary tolerance: within 1e-4 cells of the cell slab
                jnp.all(
                    (p >= (cell.astype(jnp.float32) - 1e-4) * grid.cell_w
                     + grid.bmin[None, :])
                    & (p <= (cell.astype(jnp.float32) + 1.0 + 1e-4)
                       * grid.cell_w + grid.bmin[None, :]),
                    axis=-1,
                )
            )
            ok = ok & in_cell & (t < bt)
            bt = jnp.where(ok, t, bt)
            bid = jnp.where(ok, tid, bid)
            buv = jnp.where(ok[:, None], jnp.stack([u, v], -1), buv)
            return j + 1, bt, bid, buv

        def inner_cond(inner_st):
            j, *_ = inner_st
            return jnp.any((~done) & (j < e))

        j0 = s
        _, best_t, best_id, best_uv = jax.lax.while_loop(
            inner_cond, inner, (j0, best_t, best_id, best_uv)
        )

        found = (~done) & (best_id != NO_HIT)
        # step the min-t axis (Myobj.cpp:452-470)
        axis = jnp.argmin(t_next, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_new = cell + onehot * step
        t_next_new = t_next + onehot.astype(t_next.dtype) * dt
        oob = jnp.any(
            (cell_new < 0) | (cell_new >= dims[None, :]), axis=-1
        )
        newly_done = found | oob | (it + 1 >= max_steps)
        cell = jnp.where((done | newly_done)[:, None], cell, cell_new)
        t_next = jnp.where((done | newly_done)[:, None], t_next, t_next_new)
        return cell, t_next, best_t, best_id, best_uv, done | newly_done, it + 1

    def cond(st):
        *_, done, it = st
        return jnp.any(~done) & (it < max_steps)

    st = (cell, t_next, best_t, best_id, best_uv, done, jnp.int32(0))
    cell, t_next, best_t, best_id, best_uv, done, _ = jax.lax.while_loop(
        cond, body, st
    )
    valid = best_id != NO_HIT
    return Hit(
        t=jnp.where(valid, best_t, BIG_T),
        tri_id=jnp.where(valid, best_id, NO_HIT),
        u=best_uv[:, 0],
        v=best_uv[:, 1],
        valid=valid,
    )
