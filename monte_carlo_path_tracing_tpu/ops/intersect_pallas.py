"""Pallas TPU kernel for the matmul-form ray-triangle intersection.

Placeholder for the hand-tiled kernel (lands after the end-to-end slice);
currently delegates to the jnp matmul implementation, which XLA already
maps onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from monte_carlo_path_tracing_tpu.ops import intersect_ref


def intersect_pallas(ro, rd, W, tri_ids, exclude_id=None, t_eps=intersect_ref.T_EPS):
    return intersect_ref.intersect_matmul(ro, rd, W, tri_ids, exclude_id, t_eps=t_eps)
