import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_path_tracing_tpu.ops import intersect_pallas as ip
from monte_carlo_path_tracing_tpu.ops import intersect_ref as ir


def _random_case(rng, T, N):
    v0 = jnp.asarray(rng.uniform(-2, 2, size=(T, 3)), jnp.float32)
    e1 = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)
    e2 = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)
    ro = jnp.asarray(rng.uniform(-4, 4, size=(N, 3)), jnp.float32)
    rd = rng.normal(size=(N, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True), jnp.float32)
    return v0, e1, e2, ro, rd


def test_pallas_matches_matmul_interpret(rng_np):
    """Interpret-mode kernel vs the jnp matmul reference (identical math)."""
    T, N = 700, 513  # unaligned on purpose
    v0, e1, e2, ro, rd = _random_case(rng_np, T, N)
    ids = jnp.arange(T, dtype=jnp.int32)
    W = ir.pack_tri_matrix(v0, e1, e2)
    excl = jnp.where(
        jnp.arange(N, dtype=jnp.int32) % 7 == 0,
        jnp.arange(N, dtype=jnp.int32) % T,
        jnp.int32(-1),
    )
    hp = ip.intersect_pallas(ro, rd, W, ids, exclude_id=excl)
    hm = ir.intersect_matmul(ro, rd, W, ids, exclude_id=excl)

    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hm.valid))
    m = np.asarray(hm.valid)
    np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hm.t)[m], rtol=1e-4)
    same = np.asarray(hp.tri_id)[m] == np.asarray(hm.tri_id)[m]
    assert same.mean() > 0.995
    np.testing.assert_allclose(
        np.asarray(hp.u)[m][same], np.asarray(hm.u)[m][same], atol=2e-3
    )


def test_pallas_single_triangle():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    ids = jnp.asarray([3], jnp.int32)
    W = ir.pack_tri_matrix(v0, e1, e2)
    ro = jnp.asarray([[0.25, 0.25, 2.0], [5.0, 5.0, 2.0]])
    rd = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    h = ip.intersect_pallas(ro, rd, W, ids)
    assert bool(h.valid[0]) and not bool(h.valid[1])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    assert int(h.tri_id[0]) == 3


def test_occlusion_kernels_agree(rng_np):
    import monte_carlo_path_tracing_tpu.ops.intersect as ops

    T, N = 300, 257
    v0, e1, e2, ro, rd = _random_case(rng_np, T, N)
    ids = jnp.arange(T, dtype=jnp.int32)
    W = ir.pack_tri_matrix(v0, e1, e2)
    accel = ops.TriAccel(W=W, tri_ids=ids)
    t_max = jnp.asarray(rng_np.uniform(0.5, 6.0, size=(N,)), jnp.float32)
    excl = jnp.full((N,), -1, jnp.int32)
    a = ops.occluded(accel, ro, rd, t_max, excl, impl="matmul")
    b = ops.occluded(accel, ro, rd, t_max, excl, impl="pallas")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert 0.05 < np.asarray(a).mean() < 0.95  # non-trivial case


def test_occlusion_semantics():
    import monte_carlo_path_tracing_tpu.ops.intersect as ops

    v0 = jnp.asarray([[0.0, 0.0, 1.0]])  # blocker plane z=1
    e1 = jnp.asarray([[4.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 4.0, 0.0]])
    ids = jnp.asarray([0], jnp.int32)
    accel = ops.TriAccel(W=ir.pack_tri_matrix(v0, e1, e2), tri_ids=ids)
    ro = jnp.asarray([[0.5, 0.5, 0.0]] * 3)
    rd = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    # segment ends: before the blocker, past it, exactly on it (margin)
    t_max = jnp.asarray([0.5, 2.0, 1.0])
    out = np.asarray(ops.occluded(accel, ro, rd, t_max, impl="matmul"))
    assert not out[0] and out[1] and not out[2]


def test_mxu_fast_mode_agrees(rng_np):
    """bf16x3 dot mode vs the exact vpu mode: hits agree except on a tiny
    fringe of accept-boundary cases. Nearest-hit t is recomputed exactly
    outside the kernel, so agreement is probed through quantities that DO
    flow through the approximate in-kernel dots: the accept/winner decisions
    and the occlusion predicate."""
    T, N = 700, 513
    v0, e1, e2, ro, rd = _random_case(rng_np, T, N)
    ids = jnp.arange(T, dtype=jnp.int32)
    W = ir.pack_tri_matrix(v0, e1, e2)
    h0 = ip.intersect_pallas(ro, rd, W, ids, mode="vpu")
    h1 = ip.intersect_pallas(ro, rd, W, ids, mode="mxu_fast")
    v0_, v1_ = np.asarray(h0.valid), np.asarray(h1.valid)
    assert (v0_ == v1_).mean() > 0.99
    m = v0_ & v1_ & (np.asarray(h0.tri_id) == np.asarray(h1.tri_id))
    assert m.mean() > 0.98 * v0_.mean()
    # Occlusion goes through the approximate dots end-to-end (no exact
    # recovery pass): require near-total agreement with the exact mode.
    excl = jnp.full((N,), ir.NO_HIT, jnp.int32)
    t_max = jnp.where(h0.valid, h0.t * 1.5, 10.0)
    o0 = np.asarray(ip.occluded_pallas(ro, rd, W, ids, excl, t_max, mode="vpu"))
    o1 = np.asarray(
        ip.occluded_pallas(ro, rd, W, ids, excl, t_max, mode="mxu_fast")
    )
    assert (o0 == o1).mean() > 0.995


def test_unknown_dot_mode_raises(rng_np):
    T, N = 16, 8
    v0, e1, e2, ro, rd = _random_case(rng_np, T, N)
    ids = jnp.arange(T, dtype=jnp.int32)
    W = ir.pack_tri_matrix(v0, e1, e2)
    with pytest.raises(ValueError, match="dot mode"):
        ip.intersect_pallas(ro, rd, W, ids, mode="mxufast")
