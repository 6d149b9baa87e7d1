"""Test configuration: force CPU backend with 8 virtual devices.

Must run before jax initializes so sharding tests see a multi-device mesh.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin force-appends its platform to jax_platforms
# at import time, overriding the env var — pin CPU explicitly after import.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def karate_edg() -> str:
    """In-repo copy of the public-domain Zachary karate club edgelist."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "demo",
        "karate.edg",
    )


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
