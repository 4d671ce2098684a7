from monte_carlo_path_tracing_tpu.parallel.mesh import (  # noqa: F401
    AXIS_SPP, AXIS_TILES, Mesh, make_mesh, ray_sharding, replicated,
)
from monte_carlo_path_tracing_tpu.parallel.sharded import (  # noqa: F401
    make_train_step, render_rays_sharded,
)
