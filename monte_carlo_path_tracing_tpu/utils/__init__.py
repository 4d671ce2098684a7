from monte_carlo_path_tracing_tpu.utils import config  # noqa: F401
