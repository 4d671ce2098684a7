from monte_carlo_path_tracing_tpu.scene.types import Camera, Materials, Scene  # noqa: F401
from monte_carlo_path_tracing_tpu.scene.build import build_scene, load_scene  # noqa: F401
