from monte_carlo_path_tracing_tpu.ops.intersect import TriAccel, build_accel, build_light_accel  # noqa: F401
from monte_carlo_path_tracing_tpu.ops.intersect_ref import Hit  # noqa: F401

# NOTE: the nearest-hit entry point lives at ops.intersect.intersect; it is
# deliberately not re-exported here so the submodule name is not shadowed.
