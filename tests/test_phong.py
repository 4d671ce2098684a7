import math

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.core import vecmath as vm
from monte_carlo_path_tracing_tpu.sampling import phong


def _mat(kd, ks, ns, n=1):
    return (
        jnp.tile(jnp.asarray([kd]), (n, 1)),
        jnp.tile(jnp.asarray([ks]), (n, 1)),
        jnp.full((n,), ns, jnp.float32),
    )


def test_pdf_normalizes_to_one():
    """Integrate the mixture pdf over the sphere with a uniform MC estimate.

    The diffuse lobe integrates to 1 over the hemisphere; the Phong lobe
    integrates to 1 over directions with wi.R>0 — the mixture too.
    """
    key = jax.random.key(0)
    M = 200_000
    wi = jax.random.normal(key, (M, 3))
    wi = vm.normalize(wi)
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))
    wo = jnp.tile(vm.normalize(jnp.asarray([[0.3, 0.1, 0.9]])), (M, 1))
    kd, ks, ns = _mat((0.4, 0.4, 0.4), (0.4, 0.4, 0.4), 32.0, M)
    pdf = phong.pdf_brdf(n, wi, wo, kd, ks, ns)
    integral = float(jnp.mean(pdf)) * 4.0 * math.pi
    assert abs(integral - 1.0) < 0.03, integral


def test_sample_matches_pdf_histogram():
    """Binned cos(theta) histogram of samples vs the analytic mixture pdf."""
    key = jax.random.key(1)
    M = 200_000
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))
    wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))  # normal incidence
    kd, ks, ns = _mat((0.5, 0.5, 0.5), (0.3, 0.3, 0.3), 16.0, M)
    bs = phong.sample_brdf(key, n, wo, kd, ks, ns)
    cos_t = np.asarray(vm.dot(bs.wi, n))
    # At normal incidence R = n, so the mixture density of cos(theta) is
    # p(c) = pd*2c + ps*(ns+1)c^ns on c in [0,1] (marginalised over phi).
    pd = 0.5 / 0.8
    ps = 0.3 / 0.8
    bins = np.linspace(0, 1, 21)
    hist, _ = np.histogram(np.clip(cos_t, 0, 1), bins=bins, density=True)
    c = 0.5 * (bins[:-1] + bins[1:])
    ref = pd * 2 * c + ps * 17.0 * c**16.0
    # compare against the bin-averaged analytic density
    cdf = lambda x: pd * x**2 + ps * x**17.0
    ref_binned = (cdf(bins[1:]) - cdf(bins[:-1])) / np.diff(bins)
    np.testing.assert_allclose(hist, ref_binned, rtol=0.12, atol=0.05)
    del ref


def test_sample_pdf_consistency():
    """The pdf returned by sample_brdf equals pdf_brdf at the sampled dir."""
    key = jax.random.key(2)
    M = 4096
    n = vm.normalize(jnp.tile(jnp.asarray([[0.2, -0.4, 0.9]]), (M, 1)))
    wo = vm.normalize(jnp.tile(jnp.asarray([[-0.1, 0.3, 0.95]]), (M, 1)))
    kd, ks, ns = _mat((0.6, 0.5, 0.4), (0.2, 0.25, 0.3), 50.0, M)
    bs = phong.sample_brdf(key, n, wo, kd, ks, ns)
    pdf2 = phong.pdf_brdf(n, bs.wi, wo, kd, ks, ns)
    np.testing.assert_allclose(np.asarray(bs.pdf), np.asarray(pdf2), rtol=1e-4, atol=1e-6)


def test_branch_pdf_compat_diffuse_only():
    """With Ks=0 the branch pdf equals the mixture pdf (single lobe)."""
    key = jax.random.key(3)
    M = 2048
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))
    wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))
    kd, ks, ns = _mat((0.7, 0.7, 0.7), (0.0, 0.0, 0.0), 10.0, M)
    b1 = phong.sample_brdf(key, n, wo, kd, ks, ns, branch_pdf_compat=True)
    b2 = phong.sample_brdf(key, n, wo, kd, ks, ns, branch_pdf_compat=False)
    np.testing.assert_allclose(np.asarray(b1.pdf), np.asarray(b2.pdf), rtol=1e-4)
    assert not np.any(np.asarray(b1.is_specular))


def test_eval_brdf_values():
    """Spot-check f_r against the closed form (BRDF.cpp:17-25)."""
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = vm.normalize(jnp.asarray([[0.0, 0.6, 0.8]]))
    wo = vm.normalize(jnp.asarray([[0.0, -0.6, 0.8]]))  # mirror of wi
    kd = jnp.asarray([[0.3, 0.3, 0.3]])
    ks = jnp.asarray([[0.5, 0.5, 0.5]])
    ns = jnp.asarray([8.0])
    f = np.asarray(phong.eval_brdf(n, wi, wo, kd, ks, ns))[0]
    # wo . reflect(wi, n) = 1 exactly at the mirror direction
    expected = 0.3 / math.pi + 0.5 * 9.0 / (2 * math.pi)
    np.testing.assert_allclose(f, expected, rtol=1e-5)


def test_energy_conservation_white_furnace():
    """integral f_r cos dwi <= 1 per channel for kd+ks <= 1 (MC check)."""
    key = jax.random.key(4)
    M = 200_000
    wi = vm.normalize(jax.random.normal(key, (M, 3)))
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))
    wo = jnp.tile(vm.normalize(jnp.asarray([[0.0, 0.4, 0.9]])), (M, 1))
    kd, ks, ns = _mat((0.6, 0.6, 0.6), (0.3, 0.3, 0.3), 40.0, M)
    f = phong.eval_brdf(n, wi, wo, kd, ks, ns)
    cos_t = jnp.maximum(vm.dot(wi, n), 0.0)
    integral = float(jnp.mean(f[:, 0] * cos_t)) * 4 * math.pi
    assert integral < 1.05, integral
