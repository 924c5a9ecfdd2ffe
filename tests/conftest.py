"""Test configuration: run everything on CPU with 8 virtual devices so
multi-device sharding paths are exercised without TPU hardware (the jax-native
substitute for the reference's absent distributed tests — see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The env var alone can be overridden by an ambient accelerator plugin (the
# axon TPU tunnel in CI); the config update always wins.
jax.config.update("jax_platforms", "cpu")
# fp64 oracles for numerics tests; model code pins its dtypes explicitly.
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)
