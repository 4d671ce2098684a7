"""Primary-hit cache pre-pass (integrator/regen.py::render_regen_cached).

With jitter off the reference re-traces one identical primary ray per pixel
for all spp (main.cpp:563-572); the cache pre-pass traces each pixel once,
prepares the Arvo CDF once per pixel, runs depth-0 shading densely, and
feeds only surviving continuations to the regeneration loop. These tests
pin that the cached renderer consumes the SAME streams and produces the
SAME estimate as the uncached loop — the contract that makes the cache a
pure optimization.
"""

import dataclasses

import numpy as np
import pytest

from monte_carlo_path_tracing_tpu.render.renderer import render_image_regen
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def _cfg(**kw):
    base = dict(
        width=24, height=16, spp=4, estimator="mis",
        light_sampler="spherical_triangle", max_depth=16, seed=7,
    )
    base.update(kw)
    return RenderConfig(**base)


def _small(scene):
    return dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, width=24, height=16)
    )


@pytest.mark.parametrize("estimator", ["mis", "brdf", "split"])
def test_cached_matches_uncached(cornell_scene, estimator):
    """Same streams by construction => same estimate (up to fp ordering of
    the per-pixel sums) and IDENTICAL logical ray counts."""
    s = _small(cornell_scene)
    cfg = _cfg(estimator=estimator)
    r_un = render_image_regen(s, cfg.replace(primary_cache=False), lanes=64)
    r_ca = render_image_regen(s, cfg.replace(primary_cache=True), lanes=64)
    np.testing.assert_allclose(r_ca.image, r_un.image, rtol=1e-5, atol=1e-5)
    assert r_ca.rays_traced == r_un.rays_traced


def test_cached_matches_uncached_ref_mis_weights(cornell_scene):
    """The reference-weighting MIS variant (Q11 nearest-light denominator)
    adds a light-accel trace at every vertex including depth 0 — the
    pre-pass replicates it."""
    s = _small(cornell_scene)
    cfg = _cfg(ref_mis_weights=True)
    r_un = render_image_regen(s, cfg.replace(primary_cache=False), lanes=64)
    r_ca = render_image_regen(s, cfg.replace(primary_cache=True), lanes=64)
    np.testing.assert_allclose(r_ca.image, r_un.image, rtol=1e-5, atol=1e-5)


def test_cached_matches_uncached_uniform_sampler(cornell_scene):
    s = _small(cornell_scene)
    cfg = _cfg(light_sampler="uniform_area")
    r_un = render_image_regen(s, cfg.replace(primary_cache=False), lanes=64)
    r_ca = render_image_regen(s, cfg.replace(primary_cache=True), lanes=64)
    np.testing.assert_allclose(r_ca.image, r_un.image, rtol=1e-5, atol=1e-5)


def test_launch_split_invariance(cornell_scene):
    """Multi-launch renders re-run the pre-pass per launch with spp0 riding
    in — the image must not depend on the launch split."""
    s = _small(cornell_scene)
    cfg = _cfg(spp=4).replace(primary_cache=True)
    n_pix = 24 * 16
    one = render_image_regen(s, cfg, lanes=64)
    # max 2 spp per launch -> 2 launches
    split = render_image_regen(
        s, cfg, lanes=64, max_samples_per_launch=2 * n_pix
    )
    np.testing.assert_allclose(split.image, one.image, rtol=1e-5, atol=1e-5)


def test_eligibility_validation():
    with pytest.raises(ValueError):
        _cfg(pixel_jitter=True).replace(primary_cache=True).validate()
    with pytest.raises(ValueError):
        _cfg(ref_mis_weights=True, mis_blocker_compat=True).replace(
            primary_cache=True).validate()
    _cfg(estimator="split").replace(primary_cache=True).validate()
    # auto mode silently falls back for ineligible configs
    _cfg(pixel_jitter=True).validate()


def test_spp_rounds_clamped_to_cap(cornell_scene):
    """Traced spp beyond the static spp_cap is CLAMPED (work and the
    logical ray count agree — round-4 advisor finding: rounds beyond the
    cap were silently dropped while still counted), and the sharded
    builder raises when cfg.spp statically exceeds the cap."""
    import jax.numpy as jnp

    from monte_carlo_path_tracing_tpu.core import rng
    from monte_carlo_path_tracing_tpu.integrator.regen import primary_prepass
    from monte_carlo_path_tracing_tpu.parallel import make_mesh
    from monte_carlo_path_tracing_tpu.parallel.sharded import (
        make_regen_sharded,
    )

    s = _small(cornell_scene)
    cfg = _cfg(spp=4)
    key = rng.base_key(0)
    n_pix = 24 * 16
    out_cap = primary_prepass(s, cfg, key, n_pix, 2, jnp.int32(4))
    out_ref = primary_prepass(s, cfg, key, n_pix, 2, jnp.int32(2))
    # clamped run == cap run: same fb, same logical ray count
    np.testing.assert_allclose(
        np.asarray(out_cap[0]), np.asarray(out_ref[0]), rtol=1e-6)
    assert float(out_cap[6]) == float(out_ref[6])

    mesh = make_mesh((1,), ("tiles",))
    with pytest.raises(ValueError):
        make_regen_sharded(s, cfg, mesh, 64, spp_cap=2)


def test_jitter_falls_back_uncached(cornell_scene):
    """pixel_jitter=True is ineligible: auto must route to the uncached
    loop and still render (smoke)."""
    s = _small(cornell_scene)
    cfg = _cfg(spp=2, pixel_jitter=True)
    r = render_image_regen(s, cfg, lanes=64)
    assert np.isfinite(r.image).all()


def test_sharded_cached_matches_unsharded(cornell_scene):
    """Sharded regen with spp_cap (per-shard pre-pass over an interleaved
    pixel subset) must reproduce the unsharded cached image: streams are
    keyed by global (spp round, pixel id), so the mesh layout is
    invisible to the estimate."""
    import jax
    import jax.numpy as jnp

    from monte_carlo_path_tracing_tpu.parallel import make_mesh
    from monte_carlo_path_tracing_tpu.parallel.sharded import (
        render_regen_sharded,
    )

    s = _small(cornell_scene)
    cfg = _cfg(spp=3).replace(primary_cache=True)
    un = render_image_regen(s, cfg, lanes=64)
    mesh = make_mesh((4,), ("tiles",), devices=jax.devices()[:4])
    fb, nrays = render_regen_sharded(
        s, cfg, jax.random.key(cfg.seed), mesh, lanes_per_device=64,
        spp_cap=cfg.spp,
    )
    img = (np.asarray(fb) / cfg.spp).reshape(16, 24, 3)
    np.testing.assert_allclose(img, un.image, rtol=1e-5, atol=1e-5)
