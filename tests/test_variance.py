import dataclasses

import jax
import numpy as np
import pytest

from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

import jax.numpy as jnp


@pytest.mark.slow
def test_estimator_variance_ordering(veach_scene):
    """The reference's §9 experiment as numbers (README.md:314-316, 392):
    on the Veach scene, MIS has the lowest variance; BRDF-only the highest
    on the light-sampling-friendly regions. Measured as mean per-pixel
    sample variance over K independent 1-spp renders of a small crop that
    contains diffuse floor + plates."""
    scene = veach_scene
    cam = dataclasses.replace(scene.camera, width=48, height=27)
    scene = dataclasses.replace(scene, camera=cam)
    idx = jnp.arange(48 * 27, dtype=jnp.int32)
    ro, rd = generate_rays(cam, idx)

    K = 8
    var = {}
    for est in ("brdf", "split", "mis"):
        cfg = RenderConfig(
            spp=1, estimator=est, light_sampler="spherical_triangle",
            max_depth=6, seed=0,
        )
        fn = jax.jit(lambda sc, k, o, d: render_rays(sc, cfg, k, o, d))
        imgs = np.stack([
            np.asarray(fn(scene, jax.random.key(100 + i), ro, rd))
            for i in range(K)
        ])
        # clip fireballs so the metric reflects typical-variance, as the
        # reference's visual comparison does
        imgs = np.clip(imgs, 0.0, 50.0)
        var[est] = float(imgs.var(axis=0).mean())

    # BRDF-only is clearly worst (the reference's qualitative finding).
    assert var["mis"] < var["brdf"], var
    assert var["split"] < var["brdf"], var
    # The balance heuristic guarantees MIS is within a modest constant of
    # the best single strategy (it can be slightly worse than pure light
    # sampling on mostly-diffuse crops, Veach '95 Thm. 9.2).
    assert var["mis"] < 1.5 * var["split"], var


@pytest.mark.slow
def test_light_sampler_variance_ordering(veach_scene):
    """The reference's other §9 axis (README.md:314-316): Arvo
    spherical-triangle light sampling has lower variance than uniform-area
    sampling on the Veach scene (solid-angle-uniform samples don't waste
    draws on foreshortened / distant triangle area). Same K-render
    per-pixel-variance methodology as above, split estimator (where the
    direct term isolates the light sampler)."""
    scene = veach_scene
    cam = dataclasses.replace(scene.camera, width=48, height=27)
    scene = dataclasses.replace(scene, camera=cam)
    idx = jnp.arange(48 * 27, dtype=jnp.int32)
    ro, rd = generate_rays(cam, idx)

    K = 16
    var = {}
    for ls in ("uniform_area", "spherical_triangle"):
        cfg = RenderConfig(
            spp=1, estimator="split", light_sampler=ls, max_depth=6, seed=0,
        )
        fn = jax.jit(lambda sc, k, o, d: render_rays(sc, cfg, k, o, d))
        imgs = np.stack([
            np.asarray(fn(scene, jax.random.key(200 + i), ro, rd))
            for i in range(K)
        ])
        # The samplers differ in their TAILS: uniform-area sampling spikes
        # when an area sample lands foreshortened/near the shading point
        # (1/r^2 with an area-measure pdf), which is exactly the noise the
        # reference's §9 comparison shows. A low clip (e.g. 50) truncates
        # that tail and inverts the comparison; 1e3 keeps the tail while
        # bounding the metric's own estimation noise at K renders.
        imgs = np.clip(imgs, 0.0, 1e3)
        var[ls] = float(imgs.var(axis=0).mean())

    # Measured ~4.7x apart (68 vs 319 unclipped; 68 vs 126 at clip 1e3) —
    # assert a comfortable margin of the ordering, not the exact ratio.
    assert var["spherical_triangle"] < 0.8 * var["uniform_area"], var
