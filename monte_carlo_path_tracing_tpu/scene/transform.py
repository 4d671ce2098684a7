"""Geometry-preserving scene transforms.

``subdivide_scene`` midpoint-splits every non-emissive triangle into four
children covering exactly the same surface: renders of the transformed
scene are the renders of the original (up to intersection epsilon ties on
the new shared edges), while the triangle count scales 4^levels. This is
the accel-structure stress instrument: the reference's 3k-facet scene
(README.md:212) says nothing about how the all-pairs kernel, tri-tile
culling, or the grid behave at production triangle counts — a subdivided
scene measures exactly that with the image held fixed.

Emissive triangles are left whole so the light-sampling cost (the [N, L]
Arvo field scales with L, not T) stays constant and the measurement
isolates intersection scaling.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from monte_carlo_path_tracing_tpu.scene.types import Scene


def _norm(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def subdivide_scene(scene: Scene, levels: int = 1) -> Scene:
    """Midpoint-subdivide all non-light triangles ``levels`` times
    (T -> L + (T - L) * 4^levels). Host-side numpy transform; returns a
    new Scene with lights first (their light_* rows retargeted) followed
    by the subdivided geometry."""
    import jax.numpy as jnp

    for _ in range(levels):
        is_light = np.asarray(scene.is_light)
        kid = np.where(is_light)[0]
        sid = np.where(~is_light)[0]

        v0 = np.asarray(scene.tri_v0)
        e1 = np.asarray(scene.tri_e1)
        e2 = np.asarray(scene.tri_e2)
        vn = np.asarray(scene.tri_vn)
        gn = np.asarray(scene.geo_n)
        mat = np.asarray(scene.tri_mat_id)

        a, b, c = v0[sid], v0[sid] + e1[sid], v0[sid] + e2[sid]
        mab, mac, mbc = 0.5 * (a + b), 0.5 * (a + c), 0.5 * (b + c)
        na, nb, nc = vn[sid, 0], vn[sid, 1], vn[sid, 2]
        nab, nac, nbc = _norm(na + nb), _norm(na + nc), _norm(nb + nc)

        # children as (v0, v1, v2) triples with matching corner normals;
        # same winding as the parent, so geo_n/orientation carry over.
        child_v = [
            (a, mab, mac, na, nab, nac),
            (mab, b, mbc, nab, nb, nbc),
            (mac, mbc, c, nac, nbc, nc),
            (mab, mbc, mac, nab, nbc, nac),
        ]
        cv0 = np.concatenate([t[0] for t in child_v])
        cv1 = np.concatenate([t[1] for t in child_v])
        cv2 = np.concatenate([t[2] for t in child_v])
        cvn = np.stack(
            [
                np.concatenate([t[3] for t in child_v]),
                np.concatenate([t[4] for t in child_v]),
                np.concatenate([t[5] for t in child_v]),
            ],
            axis=1,
        )
        cgn = np.tile(gn[sid], (4, 1))
        cmat = np.tile(mat[sid], 4)

        nk = kid.shape[0]
        new_v0 = np.concatenate([v0[kid], cv0])
        new_e1 = np.concatenate([e1[kid], cv1 - cv0])
        new_e2 = np.concatenate([e2[kid], cv2 - cv0])
        new_vn = np.concatenate([vn[kid], cvn])
        new_gn = np.concatenate([gn[kid], cgn])
        new_mat = np.concatenate([mat[kid], cmat])
        new_is_light = np.concatenate(
            [np.ones(nk, bool), np.zeros(cv0.shape[0], bool)]
        )

        # light rows keep their order; indices retarget to the kept block
        remap = np.full(v0.shape[0], -1, np.int64)
        remap[kid] = np.arange(nk)
        new_light_ids = remap[np.asarray(scene.light_tri_ids)]
        assert (new_light_ids >= 0).all()

        scene = dataclasses.replace(
            scene,
            tri_v0=jnp.asarray(new_v0, jnp.float32),
            tri_e1=jnp.asarray(new_e1, jnp.float32),
            tri_e2=jnp.asarray(new_e2, jnp.float32),
            tri_vn=jnp.asarray(new_vn, jnp.float32),
            geo_n=jnp.asarray(new_gn, jnp.float32),
            tri_mat_id=jnp.asarray(new_mat, jnp.int32),
            is_light=jnp.asarray(new_is_light),
            light_tri_ids=jnp.asarray(new_light_ids, jnp.int32),
        )
    return scene
