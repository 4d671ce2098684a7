from monte_carlo_path_tracing_tpu.render.camera import generate_rays, push_back_camera  # noqa: F401
from monte_carlo_path_tracing_tpu.render.renderer import render_image  # noqa: F401
