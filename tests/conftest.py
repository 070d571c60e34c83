"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on fake host devices
(``xla_force_host_platform_device_count``) exactly as recommended for
TPU-less CI; the real-chip path is exercised by bench.py / the driver.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize eagerly registers the TPU PJRT plugin at
# interpreter boot, so the env var alone is not enough — force the platform
# through the config API before any backend is used.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
