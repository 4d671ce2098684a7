"""Test harness: force CPU with an 8-device virtual mesh.

Multi-host-without-a-cluster testing per SURVEY.md §4: N-device sharding
semantics run on one host via --xla_force_host_platform_device_count. The
environment's axon sitecustomize force-registers the TPU backend, so the
platform is overridden both via env (for fresh interpreters) and via
jax.config (wins over the sitecustomize hook in this process).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from monte_carlo_path_tracing_tpu.scene import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell", "cornell.obj")
    return load_scene(path)


@pytest.fixture(scope="session")
def veach_scene():
    from monte_carlo_path_tracing_tpu.scene import load_scene

    path = os.path.join(
        os.path.dirname(__file__), "..", "scenes", "veach-mis", "veach-mis.obj"
    )
    return load_scene(path)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(1234)
