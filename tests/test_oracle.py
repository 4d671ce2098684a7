"""Wavefront estimators vs the independent NumPy/f64 recursive oracle.

The oracle (monte_carlo_path_tracing_tpu/oracle/scalar.py) re-derives the
reference's recursive estimators (/root/reference/main.cpp:269-494) from
scratch — different language, arithmetic, and control flow — so agreement
of MEANS between it and the JAX wavefront is independent evidence of
estimator correctness (SURVEY.md §7 layer 10). Streams are not shared;
agreement is statistical, with tolerances set by measured MC noise at the
test sample counts (patch means, a few percent).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_path_tracing_tpu.core import rng as jrng
from monte_carlo_path_tracing_tpu.integrator import render_rays
from monte_carlo_path_tracing_tpu.oracle import ScalarOracle
from monte_carlo_path_tracing_tpu.render.camera import generate_rays
from monte_carlo_path_tracing_tpu.utils.config import RenderConfig

# An 8-pixel probe patch spread over the 16x16 cornell view: wall, box
# faces, floor — all indirect-rich regions (no direct light pixels, whose
# exact emission both sides get trivially right).
_PIXELS = (17, 60, 100, 120, 137, 200, 230, 150)


def _patch_rays(scene, wh=16):
    cam = dataclasses.replace(scene.camera, width=wh, height=wh)
    idx = jnp.asarray(_PIXELS, jnp.int32)
    ro, rd = generate_rays(cam, idx)
    return np.asarray(ro), np.asarray(rd)


def _wavefront_mean(scene, cfg, ro, rd, spp, reps=100):
    """Mean radiance per pixel over `spp` wavefront samples (lanes replicate
    each pixel `reps` times per pass to amortize dispatch)."""
    n = len(ro)
    roN = jnp.asarray(np.repeat(ro, reps, axis=0), jnp.float32)
    rdN = jnp.asarray(np.repeat(rd, reps, axis=0), jnp.float32)
    key = jrng.base_key(cfg.seed)
    acc = np.zeros((n, 3))
    for s in range(spp // reps):
        lane = jrng.lane_keys(jrng.sample_key(key, s), jnp.arange(n * reps))
        out = np.asarray(render_rays(scene, cfg, lane, roN, rdN))
        acc += out.reshape(n, reps, 3).sum(axis=1)
    return acc / (spp // reps * reps)


def _assert_patch_close(a, b, tol, what):
    """Compare mean over the probe patch (per-pixel MC noise is too high at
    CI sample counts; the patch mean has ~1-2% sigma)."""
    ma, mb = a.mean(), b.mean()
    assert abs(ma - mb) / max(ma, mb) < tol, (what, ma, mb)


@pytest.mark.slow
def test_mis_default_matches_oracle(cornell_scene):
    """Repo-default MIS (Q11 NEE restructure, mixture pdf, balance weights)
    vs the oracle running the SAME restructure."""
    ro, rd = _patch_rays(cornell_scene)
    oracle = ScalarOracle(
        cornell_scene, estimator="mis",
        blocker_recursion=False, ref_mis_weights=False, branch_pdf=False,
    )
    img_o = oracle.trace(np.random.default_rng(0), ro, rd, 600)
    cfg = RenderConfig(spp=1, estimator="mis", max_depth=32, seed=0)
    img_w = _wavefront_mean(cornell_scene, cfg, ro, rd, 600)
    _assert_patch_close(img_o, img_w, 0.06, "mis default")


@pytest.mark.slow
def test_mis_ref_weights_and_branch_pdf_match_oracle(cornell_scene):
    """Value-level compat check: cfg(ref_mis_weights, branch_pdf_compat)
    must reproduce the reference's weighting as independently implemented
    by the oracle (blocker recursion still off on both sides)."""
    ro, rd = _patch_rays(cornell_scene)
    oracle = ScalarOracle(
        cornell_scene, estimator="mis",
        blocker_recursion=False, ref_mis_weights=True, branch_pdf=True,
    )
    img_o = oracle.trace(np.random.default_rng(1), ro, rd, 600)
    cfg = RenderConfig(
        spp=1, estimator="mis", max_depth=32, seed=1,
        ref_mis_weights=True, branch_pdf_compat=True,
    )
    img_w = _wavefront_mean(cornell_scene, cfg, ro, rd, 600)
    _assert_patch_close(img_o, img_w, 0.06, "mis ref-weights")


@pytest.mark.slow
def test_split_matches_oracle_both_measures(cornell_scene):
    """`shade` vs oracle in both Q3 modes: the measure-correct default and
    the reference's area-form/solid-angle-pdf mix (measure_bug_compat)."""
    ro, rd = _patch_rays(cornell_scene)
    for bug in (False, True):
        oracle = ScalarOracle(
            cornell_scene, estimator="split", branch_pdf=False,
            measure_bug=bug,
        )
        img_o = oracle.trace(np.random.default_rng(20 + bug), ro, rd, 800)
        cfg = RenderConfig(
            spp=1, estimator="split", max_depth=32, seed=2,
            measure_bug_compat=bug,
        )
        img_w = _wavefront_mean(cornell_scene, cfg, ro, rd, 800)
        # the Q3-bug estimator is heavy-tailed (extra cos/r^2 spikes) =>
        # wider MC tolerance
        _assert_patch_close(img_o, img_w, 0.08, f"split bug={bug}")


@pytest.mark.slow
def test_brdf_matches_oracle(cornell_scene):
    ro, rd = _patch_rays(cornell_scene)
    oracle = ScalarOracle(cornell_scene, estimator="brdf", branch_pdf=False)
    img_o = oracle.trace(np.random.default_rng(3), ro, rd, 800)
    cfg = RenderConfig(spp=1, estimator="brdf", max_depth=32, seed=3)
    img_w = _wavefront_mean(cornell_scene, cfg, ro, rd, 800)
    _assert_patch_close(img_o, img_w, 0.10, "brdf")  # heavier-tailed variance


@pytest.mark.slow
def test_blocker_queue_matches_reference_oracle(cornell_scene):
    """--ref-mis-full (regen blocker queue + ref weights + branch pdf) vs
    the oracle running the reference's EXACT recursion (main.cpp:402-494
    including the occluded-blocker branch, 455-464) — the estimator-parity
    closure of quirk Q11.

    Two-level check (the round-2 dequeue bug passed the whole-image
    tolerance because cornell's blocker branch is only ~1-2% of the image;
    level 2 pins the chain machinery itself — and
    test_regen.py::test_blocker_queue_conservation additionally verifies
    enqueue/dequeue bookkeeping record by record):

    1. Whole patch means agree (6% MC tolerance), and the oracle's
       correlated blocker-minus-restructure delta (shade_mis_pair: one walk
       returning both values on identical draws) is positive — chains add
       radiance. (The JAX-side delta is NOT asserted: regen's restructured
       mode evaluates NEE visibility through the any-hit kernel's 1e-3
       occlusion margin, so blocker-vs-restructure differ on a margin
       fringe unrelated to the queue; measured across 10 seeds the JAX
       delta is 3.9e-5 +/- 1.3e-5 vs the oracle's 1.1e-4 +/- 4.1e-5 —
       consistent, but too heavy-tailed to gate on.)
    2. CHAIN-RATE conservation: chains enqueued per path (RegenStats.chains,
       deterministic count over 153,600 paths) matches the oracle's count
       of blocker events per path (~4% MC sigma at its sample count) within
       15%. A queue that drops, spills, or double-traces chains breaks this
       count or the spill counter directly."""
    import jax

    from monte_carlo_path_tracing_tpu.integrator.regen import render_regen as rr
    from monte_carlo_path_tracing_tpu.render.camera import generate_rays

    ro, rd = _patch_rays(cornell_scene)
    oracle = ScalarOracle(
        cornell_scene, estimator="mis",
        blocker_recursion=True, ref_mis_weights=True, branch_pdf=True,
    )
    img_o, img_o_rest = oracle.trace_pair(np.random.default_rng(7), ro, rd, 600)

    # regen over a synthetic "image" of exactly the probe rays: build a
    # (len(_PIXELS) x 1) camera view is awkward, so instead trace each probe
    # pixel via regen on the 16x16 view and select the probe set.
    cam16 = dataclasses.replace(cornell_scene.camera, width=16, height=16)
    scene16 = dataclasses.replace(cornell_scene, camera=cam16)
    base = dict(width=16, height=16, spp=600, estimator="mis", max_depth=32,
                seed=13, ref_mis_weights=True, branch_pdf_compat=True)

    def run(cfg):
        fb, _, _, stats = jax.jit(
            lambda s, k: rr(s, cfg, k, 256, 256 * cfg.spp, lanes=2048)
        )(scene16, jrng.base_key(cfg.seed))
        return (np.asarray(fb) / cfg.spp)[list(_PIXELS)], stats

    img_w, stats = run(RenderConfig(**base, mis_blocker_compat=True))
    assert int(stats.spilled) == 0

    # (1) value parity on the patch
    _assert_patch_close(img_o, img_w, 0.06, "ref-mis-full vs oracle")

    # (2) chain-rate conservation over the full image
    rate_w = int(stats.chains) / (256 * 600)
    ro_all, rd_all = generate_rays(cam16, jnp.arange(256, dtype=jnp.int32))
    oracle.trace(np.random.default_rng(21), np.asarray(ro_all),
                 np.asarray(rd_all), 30)
    rate_o = oracle.chain_events / (256 * 30)
    assert rate_o > 0 and rate_w > 0, (rate_o, rate_w)
    assert abs(rate_o - rate_w) / max(rate_o, rate_w) < 0.15, (
        "chain rate", rate_o, rate_w)

    # oracle-side correlated delta: chains strictly add radiance
    d_o = (img_o - img_o_rest).mean()
    assert d_o > 0, d_o
