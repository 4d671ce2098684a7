"""Device-mesh construction and sharding helpers.

The reference is single-threaded (SURVEY.md §2 "Parallelism inventory":
none of DP/TP/PP/EP, no NCCL/MPI); all parallelism here is designed
TPU-first. The renderer's natural axes:

  - ``tiles``: pixels/ray batches sharded across devices (data parallelism —
    rays are embarrassingly parallel, main.cpp:557-578).
  - ``spp``: independent sample streams of the *same* pixels sharded across
    devices; radiance is averaged with a ``psum`` over the axis (the
    renderer's gradient-accumulation analogue, riding ICI).

Multi-host runs initialise jax.distributed and use the same mesh over the
global device set; tests use an 8-device CPU mesh
(--xla_force_host_platform_device_count, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

AXIS_TILES = "tiles"
AXIS_SPP = "spp"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (AXIS_TILES,),
    devices=None,
) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None or len(shape) == 0:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_arr, tuple(axis_names))


def ray_sharding(mesh: Mesh, axis: str = AXIS_TILES) -> NamedSharding:
    """[N, ...] ray-array sharding: leading axis split over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed_if_needed() -> None:
    """Multi-host bring-up (no-op on a single process). The TPU analogue of
    an MPI/NCCL init that the reference never had."""
    if jax.process_count() > 1:
        return
    # jax.distributed.initialize is required only under a multi-process
    # launcher; detect via the standard env vars and leave single-process
    # runs untouched.
    import os

    if "COORDINATOR_ADDRESS" in os.environ and jax.process_count() == 1:
        jax.distributed.initialize()
