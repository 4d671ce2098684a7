import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.render import film
from monte_carlo_path_tracing_tpu.render.camera import (
    camera_basis, generate_rays, pixel_len, push_back_camera,
)
from monte_carlo_path_tracing_tpu.render.renderer import render_image
from monte_carlo_path_tracing_tpu.utils import checkpoint as ck
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _small(scene, wh=24):
    cam = dataclasses.replace(scene.camera, width=wh, height=wh)
    return dataclasses.replace(scene, camera=cam)


def test_camera_rays_reference_convention(cornell_scene):
    cam = _small(cornell_scene, 64).camera
    ro, rd = generate_rays(cam, jnp.arange(64 * 64, dtype=jnp.int32))
    rd = np.asarray(rd)
    # all rays unit length, forward component along -z (camera looks -z)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, atol=1e-5)
    assert (rd[:, 2] < 0).all()
    # center pixel looks straight ahead
    center = rd[(32) * 64 + 32]
    np.testing.assert_allclose(center[:2], 0.0, atol=2e-2)
    # top rows (i=0) look up: +y
    assert rd[32, 1] > 0
    # right columns look +x
    assert rd[32 * 64 + 63, 0] > 0


def test_fov_bug_compat_narrows_fov(cornell_scene):
    cam = cornell_scene.camera
    d = camera_basis(cam)[3]
    normal = pixel_len(cam, d)
    buggy = pixel_len(dataclasses.replace(cam, fov_bug_compat=True), d)
    # Q2: tan(fovy/360) vs tan(radians(fovy)/2) => ~pi/180 smaller
    ratio = float(buggy / normal)
    assert 0.25 < ratio < 0.4  # ~1/3.17 at fovy=39 (SURVEY Q2)


def test_push_back_camera(cornell_scene):
    cam = cornell_scene.camera
    cam2 = push_back_camera(cam, 2.0)
    w1 = np.asarray(cam.lookat - cam.eye)
    w2 = np.asarray(cam2.lookat - cam2.eye)
    np.testing.assert_allclose(w2, 2.0 * w1, rtol=1e-6)


def test_checkpoint_roundtrip_and_resume(cornell_scene, tmp_path):
    scene = _small(cornell_scene)
    cfg = RenderConfig(width=24, height=24, spp=8, estimator="mis", seed=4,
                       max_depth=4, ray_chunk=576)
    full = render_image(scene, cfg).image

    # render 4 spp, checkpoint, resume for the remaining 4
    cfg4 = cfg.replace(spp=4)
    r4 = render_image(scene, cfg4)
    c = ck.RenderCheckpoint(
        framebuffer_sum=r4.image * 4, spp_done=4, seed=cfg.seed,
        config=ck.config_dict(cfg),
    )
    path = str(tmp_path / "ck.npz")
    ck.save(path, c)
    c2 = ck.load(path)
    assert c2.spp_done == 4
    np.testing.assert_allclose(c2.framebuffer_sum, c.framebuffer_sum, rtol=1e-6)
    ck.check_compatible(c2, cfg)

    resumed = render_image(
        scene, cfg, start_spp=4, framebuffer=c2.framebuffer_sum
    ).image
    np.testing.assert_allclose(resumed, full, rtol=1e-4, atol=1e-5)


def test_checkpoint_incompatible(cornell_scene, tmp_path):
    cfg = RenderConfig(width=24, height=24, spp=8, seed=4)
    c = ck.RenderCheckpoint(
        framebuffer_sum=np.zeros((24, 24, 3), np.float32), spp_done=2,
        seed=4, config=ck.config_dict(cfg),
    )
    import pytest

    with pytest.raises(ValueError):
        ck.check_compatible(c, cfg.replace(seed=5))


def test_bmp_png_writers(tmp_path):
    img = (np.random.default_rng(0).uniform(0, 300, (9, 13, 3))).astype(np.float32)
    bmp = str(tmp_path / "x.bmp")
    png = str(tmp_path / "x.png")
    film.write_image(bmp, img, 380.0, 0.25)
    film.write_image(png, img, 380.0, 0.25)
    with open(bmp, "rb") as f:
        data = f.read()
    assert data[:2] == b"BM"
    # 24bpp bottom-up: row stride padded to 4 bytes
    assert len(data) == 14 + 40 + ((13 * 3 + 3) & ~3) * 9
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_chunk_invariance(cornell_scene):
    """core/rng.py contract: streams are keyed by (sample, pixel), so the
    image must not depend on ray_chunk (up to XLA matmul tiling round-off —
    the batch size changes how the intersection einsum is tiled)."""
    scene = _small(cornell_scene, 24)
    cfg = RenderConfig(width=24, height=24, spp=2, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=8,
                       seed=42, ray_chunk=24 * 24)
    a = render_image(scene, cfg).image
    b = render_image(scene, cfg.replace(ray_chunk=128)).image
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pixel_streams_distinct(cornell_scene):
    """No two pixels of one sample share an RNG stream: with a 1-pixel-wide
    chunk vs full-image chunk the draws agree per-pixel (chunk invariance),
    and distinct pixels consume distinct draws — probed by checking the
    first-bounce RR uniforms differ across pixels."""
    import jax.numpy as jnp

    from monte_carlo_path_tracing_tpu.core import rng

    base = rng.base_key(0)
    lanes = rng.lane_keys(rng.sample_key(base, 0), jnp.arange(64))
    xi = np.asarray(rng.uniform(rng.bounce_key(lanes, 0, rng.P_RR), (64,)))
    assert np.unique(xi).size == 64


def test_golden_image_regression(cornell_scene):
    """Exact-stream regression: a fixed-seed tiny render must match the
    committed golden exactly on CPU (threefry is platform-stable; any
    estimator change shows up here)."""
    scene = _small(cornell_scene, 16)
    cfg = RenderConfig(width=16, height=16, spp=2, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=4,
                       seed=123, ray_chunk=256)
    img = render_image(scene, cfg).image
    path = os.path.join(GOLDEN, "cornell16_mis.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN, exist_ok=True)
        np.save(path, img)
        raise AssertionError("golden image created — rerun the test")
    golden = np.load(path)
    np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-6)


def test_regen_on_launch_progressive(cornell_scene):
    """render_image_regen's on_launch hook fires once per launch with the
    accumulated mean image (the progressive-preview surface; the final
    callback equals the returned image)."""
    import dataclasses

    from monte_carlo_path_tracing_tpu.render.renderer import render_image_regen
    from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

    cam = dataclasses.replace(cornell_scene.camera, width=16, height=16)
    scene = dataclasses.replace(cornell_scene, camera=cam)
    cfg = RenderConfig(width=16, height=16, spp=4, estimator="mis",
                       max_depth=4, seed=0)
    seen = []
    r = render_image_regen(
        scene, cfg, lanes=256, max_samples_per_launch=256,
        on_launch=lambda img, spp: seen.append((img.copy(), spp)),
    )
    assert [s for _, s in seen] == [1, 2, 3, 4]
    np.testing.assert_allclose(seen[-1][0], r.image, rtol=1e-6)
