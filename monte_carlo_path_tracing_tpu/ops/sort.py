"""MXU-friendly stable counting/radix sort for lane permutation keys.

Why this exists: the regen renderer wants to reorder wavefront lanes by a
small (direction, morton) coherence key every iteration so the tri-tile
culling kernels (ops/intersect_pallas.py) see coherent ray tiles — the TPU
analogue of the reference's per-ray grid walk locality (Myobj.cpp:334-474).
Round 2 attributed a ~15 ms/iteration sort cost to XLA's bitonic argsort
and this module was built to beat it. The round-3 measurement
(docs/tpu_sort_cull.json) falsified both that attribution and this
module's advantage: ``jnp.argsort`` on 65k int32 keys costs **1.2 ms** on
the current toolchain, this radix sort costs 11.5 ms for 24-bit keys
(~3.3 ms per 8-bit pass — the scatter-apply between passes dominates),
and the bulk of the old 15 ms was the *application* of the permutation to
the 13 lane-state arrays, not the argsort. ``regen.sort_lanes`` therefore
uses ``jnp.argsort``; this module stays as a correct, tested negative
result (pinned equivalent to ``argsort(stable=True)`` by tests/test_sort.py).

The TPU-native construction, for the record: a counting sort whose stable
within-block rank is a strict-lower-triangular MATMUL (one
[B,B] x [nblk,B,K] einsum on the MXU with exact small-integer arithmetic)
instead of a serial scan:

  - one-hot        oh[i, k]   = [key_i == k]                  (VPU compare)
  - block hist     h[b, k]    = sum_i oh[b*B+i, k]            (reduce)
  - in-block rank  r[b, i, k] = sum_{j<i} oh[b*B+j, k]        (MXU matmul)
  - position_i     = excl_cumsum_k(tot)[k_i]                  (tiny cumsum)
                   + excl_cumsum_b(h)[b_i, k_i] + r[b_i, i mod B, k_i]

Counts are <= B = 256 so bf16 one-hots with f32 accumulation are exact.
Multi-byte keys compose by LSD radix (stability makes passes compose).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLK = 256  # lanes per block; ranks fit bf16's 8-bit mantissa exactly


@functools.partial(jax.jit, static_argnames=("num_buckets",))
def counting_rank(key: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """Stable rank of each lane under an ascending sort of ``key``
    ([C] int32 in [0, num_buckets)). rank[i] is the sorted position of lane
    i; equal keys keep their original order. C must be a multiple of 256.
    """
    C = key.shape[0]
    assert C % _BLK == 0, C
    nblk = C // _BLK
    K = num_buckets

    buckets = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    oh = (key[:, None] == buckets).astype(jnp.bfloat16)      # [C, K]
    oh3 = oh.reshape(nblk, _BLK, K)
    hist = oh3.astype(jnp.float32).sum(axis=1)               # [nblk, K]

    # Strict lower-triangular matmul = stable prefix count within the block.
    row = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 1)
    L = (col < row).astype(jnp.bfloat16)                     # [B, B]
    pref = jnp.einsum(
        "ij,bjk->bik", L, oh3, preferred_element_type=jnp.float32
    )                                                        # [nblk, B, K]
    # one-hot select of the lane's own column (exact: single nonzero term)
    r_in_blk = (pref * oh3.astype(jnp.float32)).sum(axis=-1).reshape(C)

    total = hist.sum(axis=0)                                 # [K]
    key_base = jnp.cumsum(total) - total                     # exclusive [K]
    blk_base = jnp.cumsum(hist, axis=0) - hist               # exclusive [nblk, K]

    blk_id = jax.lax.broadcasted_iota(jnp.int32, (C,), 0) // _BLK
    pos = key_base[key] + blk_base[blk_id, key] + r_in_blk
    return pos.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("key_bits", "radix_bits"))
def sort_perm(key: jnp.ndarray, key_bits: int, radix_bits: int = 8) -> jnp.ndarray:
    """Permutation ``order`` such that ``key[order]`` is ascending and the
    sort is stable, via LSD radix over ``radix_bits``-wide digits. ``key``
    is [C] non-negative int32 below 2**key_bits; C a multiple of 256.

    Equivalent to ``jnp.argsort(key, stable=True)`` — pinned by
    tests/test_sort.py — at a fraction of the bitonic network's cost.
    """
    C = key.shape[0]
    order = jax.lax.broadcasted_iota(jnp.int32, (C,), 0)
    k = key
    for shift in range(0, key_bits, radix_bits):
        digit = (k >> shift) & ((1 << radix_bits) - 1)
        pos = counting_rank(digit, 1 << radix_bits)
        inv = jnp.zeros((C,), jnp.int32).at[pos].set(
            jax.lax.broadcasted_iota(jnp.int32, (C,), 0)
        )
        order = order[inv]
        k = k[inv]
    return order
