"""Progressive render checkpoints (SURVEY.md §5: the reference has none —
a killed run loses everything; here spp-chunked accumulation checkpoints the
summed framebuffer + progress, and resuming is exact because the RNG is
counter-based (seed + next sample id fully determine the remaining stream)."""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
import numpy as np

from monte_carlo_path_tracing_tpu.utils.config import RenderConfig


@dataclasses.dataclass
class RenderCheckpoint:
    framebuffer_sum: np.ndarray  # [H, W, 3] sum over completed spp
    spp_done: int
    seed: int
    config: dict

    def mean_image(self) -> np.ndarray:
        return self.framebuffer_sum / max(self.spp_done, 1)


def save(path: str, ckpt: RenderCheckpoint) -> None:
    """Atomic npz+json save (tmp file + rename)."""
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    os.close(fd)
    try:
        np.savez_compressed(
            tmp,
            framebuffer_sum=ckpt.framebuffer_sum,
            spp_done=np.int64(ckpt.spp_done),
            seed=np.int64(ckpt.seed),
            config=np.frombuffer(
                json.dumps(ckpt.config).encode(), dtype=np.uint8
            ),
        )
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    finally:
        for p in (tmp, tmp + ".npz"):
            if os.path.exists(p):
                os.remove(p)


def load(path: str) -> RenderCheckpoint:
    with np.load(path) as z:
        return RenderCheckpoint(
            framebuffer_sum=z["framebuffer_sum"],
            spp_done=int(z["spp_done"]),
            seed=int(z["seed"]),
            config=json.loads(bytes(z["config"]).decode()),
        )


def config_dict(cfg: RenderConfig) -> dict:
    return dataclasses.asdict(cfg)


def check_compatible(ckpt: RenderCheckpoint, cfg: RenderConfig) -> None:
    """Refuse to resume across configs that change the estimate."""
    old = ckpt.config
    new = config_dict(cfg)
    for k in ("width", "height", "estimator", "light_sampler", "rr_prob",
              "max_depth", "seed", "pixel_jitter"):
        if old.get(k) != new.get(k):
            raise ValueError(
                f"checkpoint incompatible: {k} was {old.get(k)}, now {new.get(k)}"
            )
