from monte_carlo_path_tracing_tpu.sampling import phong, light_uniform, light_spherical  # noqa: F401
