import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.core import radiometry, vecmath as vm


def test_cross_dot_det(rng_np):
    a, b, c = (jnp.asarray(rng_np.normal(size=(5, 3)), jnp.float32) for _ in range(3))
    np.testing.assert_allclose(vm.dot(a, b), np.sum(np.asarray(a) * np.asarray(b), -1), rtol=1e-5)
    np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-4, atol=1e-5)
    # scalar triple product = det of the 3x3 with rows a,b,c
    det = np.linalg.det(np.stack([np.asarray(a), np.asarray(b), np.asarray(c)], axis=1))
    np.testing.assert_allclose(vm.det3(a, b, c), det, rtol=1e-3, atol=1e-4)


def test_normalize_safe():
    v = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    out = np.asarray(vm.normalize(v))
    np.testing.assert_allclose(out[0], [0.6, 0.0, 0.8], rtol=1e-6)
    assert np.all(np.isfinite(out[1]))


def test_reflect():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wi = vm.normalize(jnp.asarray([[1.0, 0.0, 1.0]]))
    r = np.asarray(vm.reflect(wi, n))[0]
    np.testing.assert_allclose(r, np.asarray(vm.normalize(jnp.asarray([[-1.0, 0.0, 1.0]])))[0], atol=1e-6)


def test_orthonormal_basis(rng_np):
    n = np.asarray(vm.normalize(jnp.asarray(rng_np.normal(size=(64, 3)), jnp.float32)))
    t, b = vm.orthonormal_basis(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(b * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    # right-handed: t x b = n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


def test_local_frame_roundtrip(rng_np):
    n = vm.normalize(jnp.asarray(rng_np.normal(size=(16, 3)), jnp.float32))
    t, b = vm.orthonormal_basis(n)
    w = vm.normalize(jnp.asarray(rng_np.normal(size=(16, 3)), jnp.float32))
    wl = vm.to_local(w, t, b, n)
    back = vm.from_local(wl, t, b, n)
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-5)


def test_tone_map_reference_semantics():
    # clamp(floor((R/maxR)^gamma*255+0.5),0,255)  (RadianceRGB.cpp:51-67)
    rad = jnp.asarray([[0.0, 380.0, 95.0], [1e6, 380.0 / 2**4, -1.0]])
    out = np.asarray(radiometry.tone_map(rad, 380.0, 0.25))
    expected = np.clip(
        np.floor(np.power(np.maximum(np.asarray(rad), 0) / 380.0, 0.25) * 255 + 0.5),
        0, 255,
    ).astype(np.uint8)
    np.testing.assert_array_equal(out, expected)
    assert out[0, 1] == 255 and out[1, 0] == 255 and out[1, 2] == 0


def test_parse_radiance():
    np.testing.assert_allclose(
        np.asarray(radiometry.parse_radiance("1.5,2,3")), [1.5, 2.0, 3.0]
    )
