"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths compile and run without TPU hardware (SURVEY.md §7 / task contract)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported at interpreter startup (sitecustomize); the env
# var is then ignored, but the backend is not yet initialised, so the config
# update below still takes effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
