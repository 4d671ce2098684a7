"""Profiling & observability (SURVEY.md §5: the reference has none beyond a
per-row printf). Wraps jax.profiler for device traces plus lightweight
wall-clock phase timers for the render driver."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulating wall-clock timers keyed by phase name.

    Use around *blocked* device work (call jax.block_until_ready inside the
    region, or pass block=the output) — async dispatch otherwise attributes
    time to the wrong phase.
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
            for k, v in sorted(self.totals.items())
        }

    def dump(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace (view with tensorboard / xprof). No-op if logdir
    is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_stats(fn, *args, **kwargs) -> dict:
    """FLOP/memory estimate of a jitted function via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
    except Exception:  # backend without cost analysis
        cost = {}
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "memory_mb": None if not cost else round(
            (cost.get("bytes accessed", 0.0) or 0.0) / 1e6, 2
        ),
    }
