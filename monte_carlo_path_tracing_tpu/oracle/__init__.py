from monte_carlo_path_tracing_tpu.oracle.scalar import ScalarOracle  # noqa: F401
