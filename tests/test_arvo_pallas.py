"""Fused Arvo selection kernel (ops/arvo_pallas.py) vs the jnp path.

The kernel must reproduce light_spherical.prepare's weights_sum and the
inverse-CDF pick on the same uniforms — up to summation-order rounding at
CDF boundaries (module docstring), which on random uniforms is a ~1e-7
event; these tests assert exact index agreement away from boundaries and
tight wsum agreement everywhere.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_path_tracing_tpu.core import rng
from monte_carlo_path_tracing_tpu.ops import arvo_pallas
from monte_carlo_path_tracing_tpu.sampling import light_spherical


@pytest.fixture(scope="module")
def veach(veach_scene):
    return veach_scene


def _points(scene, n, seed=0):
    k = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    lo = jnp.min(scene.tri_v0, axis=0)
    hi = jnp.max(scene.tri_v0, axis=0)
    x1 = jax.random.uniform(k1, (n, 3)) * (hi - lo) * 0.8 + lo + 0.1 * (hi - lo)
    nrm = jax.random.normal(k2, (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    u = jax.random.uniform(k3, (n,))
    return x1, nrm, u


def test_atan2_poly_accuracy():
    y = jnp.abs(jnp.asarray(np.random.default_rng(0).normal(size=4096), jnp.float32))
    x = jnp.asarray(np.random.default_rng(1).normal(size=4096), jnp.float32)
    got = arvo_pallas._atan2_pos(y, x)
    want = np.arctan2(np.asarray(y, np.float64), np.asarray(x, np.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-7)


def test_fused_matches_jnp_path(veach):
    n = 512
    x1, nrm, u = _points(veach, n)
    w, wsum = light_spherical.prepare(veach, x1, nrm)
    idx_k, wsum_k = arvo_pallas.arvo_select(veach, x1, nrm, u)

    # weights_sum: same quantity, different summation order / atan
    # formulation; f32 cancellation in the quadratic form dominates
    # (measured max rel err 4e-4 on this scene). The error is bias-neutral:
    # the SAME wsum feeds both the selection probabilities and the
    # reported pdf, so it cancels in the estimator (kernel docstring).
    np.testing.assert_allclose(
        np.asarray(wsum_k), np.asarray(wsum), rtol=1e-3, atol=1e-6)

    # jnp-path pick on the same uniforms.
    cdf = jnp.cumsum(w, axis=-1)
    thresh = u * wsum
    idx_j = jnp.minimum(
        jnp.sum((cdf <= thresh[:, None]).astype(jnp.int32), axis=-1),
        w.shape[-1] - 1,
    )
    agree = np.mean(np.asarray(idx_k) == np.asarray(idx_j))
    # Disagreements can only come from rounding at CDF boundaries; on 512
    # random uniforms they should essentially never occur.
    assert agree >= 0.998, agree
    # Wherever they agree, weights of the picked triangle must be positive
    # unless the row had no projectable light at all.
    has = np.asarray(wsum) > light_spherical.EPS
    w_np = np.asarray(w)
    picked_w = w_np[np.arange(n), np.asarray(idx_k)]
    assert np.all(picked_w[has & (np.asarray(idx_k) == np.asarray(idx_j))] > 0)


def test_fused_selection_distribution(veach):
    """Frequencies of picked triangles follow weights/weights_sum."""
    n = 8192
    x1 = jnp.broadcast_to(jnp.asarray([0.0, 3.0, 0.05]), (n, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    u = jax.random.uniform(jax.random.key(7), (n,))
    idx, wsum = arvo_pallas.arvo_select(veach, x1, nrm, u)
    w, ws = light_spherical.prepare(veach, x1[:1], nrm[:1])
    p = np.asarray(w[0] / ws[0])
    counts = np.bincount(np.asarray(idx), minlength=p.shape[0]) / n
    tvd_kernel = 0.5 * np.abs(counts - p).sum()
    # Control: the jnp inverse-CDF pick on the same uniforms has the same
    # MC noise floor — the kernel must not be measurably worse.
    cdf = np.cumsum(np.asarray(w[0]))
    idx_j = np.minimum(
        np.searchsorted(cdf, np.asarray(u) * float(ws[0]), side="right"),
        p.shape[0] - 1,
    )
    counts_j = np.bincount(idx_j, minlength=p.shape[0]) / n
    tvd_ctrl = 0.5 * np.abs(counts_j - p).sum()
    assert tvd_kernel < tvd_ctrl * 1.2 + 0.005, (tvd_kernel, tvd_ctrl)


def test_sample_fused_flag_smoke(veach):
    """sample(fused=True) returns a structurally valid LightSample that
    matches the unfused sample wherever the picks agree."""
    n = 256
    x1, nrm, _ = _points(veach, n, seed=3)
    key = rng.fold_in(rng.base_key(0), 1234)
    ls_f, ws_f = light_spherical.sample(key, veach, x1, nrm, fused=True)
    ls_j, ws_j = light_spherical.sample(key, veach, x1, nrm, fused=False)
    np.testing.assert_allclose(
        np.asarray(ws_f), np.asarray(ws_j), rtol=2e-5, atol=1e-6)
    same = np.asarray(ls_f.light_idx) == np.asarray(ls_j.light_idx)
    assert same.mean() >= 0.99
    np.testing.assert_allclose(
        np.asarray(ls_f.coord)[same], np.asarray(ls_j.coord)[same],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ls_f.pdf)[same], np.asarray(ls_j.pdf)[same],
        rtol=2e-5, atol=1e-7)
