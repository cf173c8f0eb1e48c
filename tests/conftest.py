"""Test fixtures.

Forces the CPU backend with 8 virtual devices so multi-chip sharding tests
run without a pod (replaces the reference's 2-core-TPU-chip trick,
tpu/tpu_ops_test.py:31-42; see SURVEY.md §4). Must run before jax
initializes a backend — the axon sitecustomize pins JAX_PLATFORMS=axon, so
we override through jax.config instead of the env var.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from compare_gan_tpu import config as gin  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_gin():
    gin.clear_config()
    yield
    gin.clear_config()
