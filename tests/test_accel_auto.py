"""accel='auto' dispatch policy (ops/intersect.py::auto_policy).

The thresholds come from the measured crossover on the veach tessellation
variants (docs/tpu_scale_crossover.json): plain all-pairs wins at 3k/10k
triangles, sort+cull crosses over near ~30k, and the culled resident
kernel's whole-W VMEM residency caps out near ~100k. The reference's
uniform grid never wins on TPU, so auto never picks it.
"""

import dataclasses

import numpy as np

from monte_carlo_path_tracing_tpu.ops.intersect import (
    AUTO_CULL_MAX_TRIS, AUTO_CULL_MIN_TRIS, auto_policy,
)
from monte_carlo_path_tracing_tpu.render.renderer import render_image_regen
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


def test_policy_picks_per_triangle_count():
    # bundled scenes (~3k) and the 10k variant: plain all-pairs
    for t in (182, 3136, 10244):
        pol = auto_policy(t)
        assert not pol["cull"] and not pol["ray_sort"], (t, pol)
        assert pol["cull_coherent"]
    # the measured crossover window: sort+cull on
    for t in (30404, AUTO_CULL_MIN_TRIS, AUTO_CULL_MAX_TRIS):
        pol = auto_policy(t)
        assert pol["cull"] and pol["ray_sort"], (t, pol)
    # above the resident kernel's VMEM ceiling: everything off
    pol = auto_policy(103448)
    assert not pol["cull"] and not pol["cull_coherent"], pol
    assert AUTO_CULL_MIN_TRIS < 30404 <= AUTO_CULL_MAX_TRIS


def test_auto_matches_all_pairs_below_crossover(cornell_scene):
    """At bundled-scene scale the policy turns nothing on, so auto must be
    the identical program (exact image equality)."""
    s = dataclasses.replace(
        cornell_scene,
        camera=dataclasses.replace(cornell_scene.camera, width=16, height=12),
    )
    cfg = RenderConfig(width=16, height=12, spp=2, estimator="mis",
                       light_sampler="spherical_triangle", max_depth=6, seed=1)
    a = render_image_regen(s, cfg.replace(accel="auto"), lanes=64)
    b = render_image_regen(s, cfg.replace(accel="all_pairs"), lanes=64)
    np.testing.assert_array_equal(a.image, b.image)
