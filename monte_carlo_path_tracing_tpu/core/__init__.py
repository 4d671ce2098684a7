from monte_carlo_path_tracing_tpu.core import vecmath, rng, radiometry  # noqa: F401
