"""Uniform-grid accel + 3D-DDA traversal (C10/C12, Myobj.cpp:78-162,334-474)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.ops import grid as grid_mod
from monte_carlo_path_tracing_tpu.ops import intersect as ops_intersect
from monte_carlo_path_tracing_tpu.ops.intersect_ref import NO_HIT


def _random_rays(scene, n, seed, spread=1.0):
    """Rays from jittered points near the camera toward scene geometry."""
    rng = np.random.default_rng(seed)
    v0 = np.asarray(scene.tri_v0)
    lo, hi = v0.min(0), v0.max(0)
    eye = np.asarray(scene.camera.eye)
    ro = eye[None, :] + rng.normal(scale=spread, size=(n, 3)).astype(np.float32)
    target = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_grid_build_invariants(cornell_scene):
    g = grid_mod.build_grid(cornell_scene, n0=5000)
    nx, ny, nz = g.dims
    start = np.asarray(g.cell_start)
    tris = np.asarray(g.cell_tris)
    assert start.shape == (nx * ny * nz + 1,)
    assert start[0] == 0 and start[-1] == tris.shape[0]
    assert np.all(np.diff(start) >= 0)
    # every triangle is inserted into at least one cell
    assert set(np.unique(tris)) == set(range(cornell_scene.num_tris))
    # cell width follows the reference formula d = max_extent / n0^(1/3)
    v0 = np.asarray(cornell_scene.tri_v0)
    e1 = np.asarray(cornell_scene.tri_e1)
    e2 = np.asarray(cornell_scene.tri_e2)
    pts = np.concatenate([v0, v0 + e1, v0 + e2])
    ext = (pts.max(0) - pts.min(0)) * 1.0002
    np.testing.assert_allclose(
        float(g.cell_w), ext.max() / np.cbrt(5000), rtol=1e-3
    )


def test_grid_matches_brute_force_cornell(cornell_scene):
    g = grid_mod.build_grid(cornell_scene, n0=5000)
    bf = ops_intersect.build_accel(cornell_scene)
    ro, rd = _random_rays(cornell_scene, 512, seed=0, spread=50.0)
    hg = jax.jit(lambda: grid_mod.intersect_grid(g, ro, rd))()
    hb = jax.jit(lambda: ops_intersect.intersect(bf, ro, rd, impl="matmul"))()
    np.testing.assert_array_equal(np.asarray(hg.valid), np.asarray(hb.valid))
    same = np.asarray(hg.tri_id) == np.asarray(hb.tri_id)
    # allow tie-breaks at shared edges: t must still agree everywhere
    assert same.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(hg.t)[np.asarray(hb.valid)],
        np.asarray(hb.t)[np.asarray(hb.valid)],
        rtol=1e-4, atol=1e-4,
    )


def test_grid_matches_brute_force_veach(veach_scene):
    g = grid_mod.build_grid(veach_scene, n0=100_000)
    bf = ops_intersect.build_accel(veach_scene)
    ro, rd = _random_rays(veach_scene, 512, seed=1, spread=2.0)
    hg = jax.jit(lambda: grid_mod.intersect_grid(g, ro, rd))()
    hb = jax.jit(lambda: ops_intersect.intersect(bf, ro, rd, impl="matmul"))()
    agree = np.asarray(hg.valid) == np.asarray(hb.valid)
    assert agree.mean() > 0.995  # boundary-epsilon stragglers only
    both = np.asarray(hg.valid) & np.asarray(hb.valid)
    np.testing.assert_allclose(
        np.asarray(hg.t)[both], np.asarray(hb.t)[both], rtol=1e-3, atol=1e-3
    )


def test_grid_outside_origin_entry(cornell_scene):
    """Rays starting far outside the AABB enter correctly (the reference
    instead seeded the AABB with the eye, quirk Q7 — also supported)."""
    g = grid_mod.build_grid(cornell_scene, n0=5000)
    bf = ops_intersect.build_accel(cornell_scene)
    v0 = np.asarray(cornell_scene.tri_v0)
    center = jnp.asarray((v0.min(0) + v0.max(0)) / 2.0)
    ro = jnp.tile(center + jnp.array([0.0, 0.0, -10000.0]), (8, 1))
    rd = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (8, 1))
    hg = grid_mod.intersect_grid(g, ro, rd)
    hb = ops_intersect.intersect(bf, ro, rd, impl="matmul")
    np.testing.assert_array_equal(np.asarray(hg.valid), np.asarray(hb.valid))
    np.testing.assert_allclose(
        np.asarray(hg.t), np.asarray(hb.t), rtol=1e-4, atol=1e-2
    )
    # camera-seeded AABB variant builds and hits too
    g2 = grid_mod.build_grid(
        cornell_scene, n0=5000, include_point=np.asarray(ro[0])
    )
    hg2 = grid_mod.intersect_grid(g2, ro, rd)
    np.testing.assert_array_equal(np.asarray(hg2.valid), np.asarray(hb.valid))


def test_grid_exclusion_and_miss(cornell_scene):
    g = grid_mod.build_grid(cornell_scene, n0=5000)
    ro, rd = _random_rays(cornell_scene, 64, seed=2, spread=50.0)
    h1 = grid_mod.intersect_grid(g, ro, rd)
    # excluding the hit triangle forbids re-reporting it
    h2 = grid_mod.intersect_grid(g, ro, rd, exclude_id=h1.tri_id)
    both = np.asarray(h1.valid) & np.asarray(h2.valid)
    assert np.all(np.asarray(h1.tri_id)[both] != np.asarray(h2.tri_id)[both])
    # rays pointing away from the scene miss
    away = grid_mod.intersect_grid(
        g, ro + 1e4, jnp.tile(jnp.array([0.0, 0.0, 1.0]), (64, 1))
    )
    assert not bool(jnp.any(away.valid))
    assert np.all(np.asarray(away.tri_id) == int(NO_HIT))


def test_grid_lights_only(veach_scene):
    """Lights-only grid = the C12 light-triangle traversal, minus Q10."""
    g = grid_mod.build_grid(veach_scene, n0=100_000, lights_only=True)
    assert set(np.unique(np.asarray(g.cell_tris))) == set(
        np.asarray(veach_scene.light_tri_ids).tolist()
    )
    bf = ops_intersect.build_light_accel(veach_scene)
    ro, rd = _random_rays(veach_scene, 256, seed=3, spread=2.0)
    hg = grid_mod.intersect_grid(g, ro, rd)
    hb = ops_intersect.intersect(bf, ro, rd, impl="matmul")
    agree = np.asarray(hg.valid) == np.asarray(hb.valid)
    assert agree.mean() > 0.995
    both = np.asarray(hg.valid) & np.asarray(hb.valid)
    assert (np.asarray(hg.tri_id)[both] == np.asarray(hb.tri_id)[both]).mean() > 0.99


def test_render_with_grid_matches_all_pairs(cornell_scene):
    """Whole-image equivalence: identical RNG streams + identical hits =>
    the grid render reproduces the all-pairs render."""
    from monte_carlo_path_tracing_tpu.render.renderer import render_image
    from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

    cam = dataclasses.replace(cornell_scene.camera, width=24, height=24)
    scene = dataclasses.replace(cornell_scene, camera=cam)
    base = dict(width=24, height=24, spp=2, estimator="mis", max_depth=4,
                ray_chunk=576, seed=5)
    img_bf = render_image(scene, RenderConfig(**base)).image
    img_g = render_image(scene, RenderConfig(**base, accel="grid",
                                             grid_n0=5000)).image
    assert np.isfinite(img_g).all()
    # hits can differ on a handful of boundary lanes; images must agree
    # closely in aggregate and almost everywhere pointwise
    close = np.isclose(img_g, img_bf, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.985
    np.testing.assert_allclose(img_g.mean(), img_bf.mean(), rtol=5e-3)
