from monte_carlo_path_tracing_tpu.integrator.wavefront import render_rays  # noqa: F401
