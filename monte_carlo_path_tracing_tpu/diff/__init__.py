from monte_carlo_path_tracing_tpu.diff.grad import (  # noqa: F401
    LatentMaterials, from_latent, latent_loss_and_grad, loss_and_grad,
    pixel_grad, render_loss, to_latent,
)
from monte_carlo_path_tracing_tpu.diff.inverse import InverseResult, recover_materials  # noqa: F401
