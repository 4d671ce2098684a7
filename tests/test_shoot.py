"""Legacy `shoot` estimator (C17, reference main.cpp:96-265)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.integrator import legacy_shoot
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def test_inverse_F_theta_satisfies_cdf():
    """Newton inversion solves F(theta) = ksi for the joint CDF
    (inverse_F_theta, main.cpp:32-55)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.05, 2.0, 64), jnp.float32)
    y = jnp.asarray(rng.uniform(0.0, 2.0, 64), jnp.float32)
    n = jnp.asarray(rng.uniform(1.0, 100.0, 64), jnp.float32)
    ksi = jnp.asarray(rng.uniform(0.01, 0.99, 64), jnp.float32)
    th = legacy_shoot._inverse_F_theta(x, y, n, ksi)
    c = jnp.cos(th)
    F = 1.0 - (x * (n + 1.0) * c + y * c ** (n + 1.0)) / (x * (n + 1.0) + y)
    np.testing.assert_allclose(np.asarray(F), np.asarray(ksi), atol=2e-3)


def test_inverse_F_theta_diffuse_closed_form():
    """y=0 collapses the CDF to F = 1 - cos(theta) => theta = acos(1-ksi)."""
    ksi = jnp.linspace(0.05, 0.95, 16)
    th = legacy_shoot._inverse_F_theta(
        jnp.ones_like(ksi), jnp.zeros_like(ksi), jnp.full_like(ksi, 10.0), ksi
    )
    np.testing.assert_allclose(
        np.asarray(th), np.arccos(1.0 - np.asarray(ksi)), atol=2e-3
    )


def test_cal_M_degenerate_horizon_is_one():
    """a1=a2~0 => theta0 = pi/2 everywhere (cal_theta0, main.cpp:61-62),
    the Simpson integrand vanishes and M = 1 (main.cpp:85)."""
    one = jnp.ones((4,))
    M = legacy_shoot._cal_M(
        one, one, 10.0 * one, 1e-12 * one, 1e-12 * one, one
    )
    np.testing.assert_allclose(np.asarray(M), 1.0, atol=1e-5)


def test_r_frame_orthonormal_and_degenerate():
    rng = np.random.default_rng(3)
    ns = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    ns = ns / jnp.linalg.norm(ns, axis=-1, keepdims=True)
    l = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)
    # make half the lanes exactly degenerate (l == N, main.cpp:189)
    l = l.at[:16].set(ns[:16])
    xc, yc, zc = legacy_shoot._r_frame(ns, l)
    for a, b in [(xc, yc), (yc, zc), (xc, zc)]:
        np.testing.assert_allclose(
            np.sum(np.asarray(a) * np.asarray(b), -1), 0.0, atol=1e-5
        )
    for a in (xc, yc, zc):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5
        )
    # degenerate lanes: z column is N itself (R = N, main.cpp:191)
    np.testing.assert_allclose(np.asarray(zc[:16]), np.asarray(ns[:16]), atol=1e-6)


def _shoot_render(scene, n=256, seed=0, **cfg_kw):
    cfg = RenderConfig(estimator="shoot", max_depth=6, seed=seed, **cfg_kw)
    cam = dataclasses.replace(scene.camera, width=16, height=16)
    scene = dataclasses.replace(scene, camera=cam)
    idx = jnp.arange(n, dtype=jnp.int32) % (16 * 16)
    ro, rd = generate_rays(scene.camera, idx)
    key = jax.random.key(seed)
    fn = jax.jit(
        lambda s, k: legacy_shoot.render_rays_shoot(s, cfg, k, ro, rd, with_stats=True)
    )
    return fn(scene, key)


def test_shoot_runs_finite_and_deterministic(cornell_scene):
    L1, st1 = _shoot_render(cornell_scene)
    L2, st2 = _shoot_render(cornell_scene)
    assert bool(jnp.all(jnp.isfinite(L1)))
    assert bool(jnp.all(L1 >= 0.0))
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    # px is a probability product in (0, 1]; steps bounded by max_depth
    assert bool(jnp.all(st1["px"] > 0.0))
    assert bool(jnp.all(st1["steps"] <= 6))
    assert int(st1["rays"]) > 0
    # some lanes must actually have produced light
    assert float(jnp.max(L1)) > 0.0


def test_shoot_via_render_rays_dispatch(cornell_scene):
    """estimator="shoot" is reachable through the public entry point."""
    from monte_carlo_path_tracing_tpu.integrator import render_rays

    cfg = RenderConfig(estimator="shoot", max_depth=4, seed=1)
    cam = dataclasses.replace(cornell_scene.camera, width=8, height=8)
    scene = dataclasses.replace(cornell_scene, camera=cam)
    idx = jnp.arange(64, dtype=jnp.int32)
    ro, rd = generate_rays(scene.camera, idx)
    L, stats = render_rays(scene, cfg, jax.random.key(0), ro, rd, with_stats=True)
    assert L.shape == (64, 3)
    assert bool(jnp.all(jnp.isfinite(L)))
    assert int(stats["nonfinite"]) == 0
