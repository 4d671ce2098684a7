"""Host-materializing timing helpers.

``jax.block_until_ready`` is NOT trusted on the axon TPU platform: in
round 2 it returned before a regen ``while_loop`` program finished, and a
physically impossible 33,830 Mrays/s was recorded (VERDICT.md round 2,
weak #1). Every timed region here therefore ends at ``np.asarray`` of every
output leaf — a device->host copy cannot complete before the program has —
which matches how the credible artifacts (docs/configs2_veach_1024.json)
were measured. bench.py additionally asserts a flops-derived throughput
ceiling so an impossible number aborts instead of being recorded.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def materialize(out):
    """Force every array leaf of ``out`` onto the host; returns the leaves."""
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]


def timed(fn, *args, n: int = 20):
    """(mean seconds per call over ``n`` calls, last output). Warmup call +
    host materialization outside the clock; the timed region ends at a host
    materialization of the final call's outputs (device execution is
    in-order, so the final copy retires every dispatched call)."""
    out = fn(*args)
    materialize(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    materialize(out)
    return (time.perf_counter() - t0) / n, out
