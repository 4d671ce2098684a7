"""subdivide_scene: same surface, 4x the triangles, same image."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from monte_carlo_path_tracing_tpu.core import rng
from monte_carlo_path_tracing_tpu.integrator.regen import render_regen
from monte_carlo_path_tracing_tpu.scene.transform import subdivide_scene
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def test_counts_and_geometry(cornell_scene):
    s = cornell_scene
    s2 = subdivide_scene(s, 1)
    L = int(s.num_lights)
    assert s2.num_tris == L + (s.num_tris - L) * 4
    assert s2.num_lights == L
    # total non-light area preserved
    area = lambda sc: float(
        (0.5 * jnp.linalg.norm(jnp.cross(sc.tri_e1, sc.tri_e2), axis=-1))[
            ~sc.is_light
        ].sum()
    )
    np.testing.assert_allclose(area(s2), area(s), rtol=1e-5)
    # light rows unchanged
    np.testing.assert_allclose(
        np.asarray(s2.light_area), np.asarray(s.light_area))
    em1 = np.asarray(s.light_emission())
    em2 = np.asarray(s2.light_emission())
    np.testing.assert_allclose(em2, em1)


def test_subdivided_render_matches(cornell_scene):
    """The subdivided scene renders the same image (same surfaces, same
    materials); only intersection-tie epsilons on new shared edges can
    differ, so compare at MC-mean level with a tight tolerance and
    identical streams."""
    res = 16
    s = dataclasses.replace(
        cornell_scene,
        camera=dataclasses.replace(cornell_scene.camera, width=res, height=res),
    )
    s2 = subdivide_scene(s, 1)
    cfg = RenderConfig(width=res, height=res, spp=4, estimator="mis",
                       max_depth=4, seed=0)
    key = rng.base_key(0)
    n_pix = res * res

    def render(sc):
        fb, _, _, _ = render_regen(sc, cfg, key, n_pix, n_pix * 4, lanes=256)
        return np.asarray(fb) / 4

    a, b = render(s), render(s2)
    # identical streams; hits land on the same surfaces. Differences can
    # only come from rare edge-tie flips.
    frac_equal = np.mean(np.isclose(a, b, rtol=1e-4, atol=1e-5))
    assert frac_equal > 0.95, frac_equal
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.02)
