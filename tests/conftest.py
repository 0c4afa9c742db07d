"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so multi-chip sharding tests run without TPU hardware
(SURVEY.md §4c — the TPU-native analog of "multi-node without a real
cluster").
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may have pre-imported jax with another platform pinned
# (e.g. a TPU plugin registered from sitecustomize); the config update
# wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

# Allow float64 golden references in tests.  Library code is explicitly
# dtyped, so this does not change the behavior under test.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Keep the default run fast (< 8 min on a 1-vCPU host): tests
    marked ``slow`` (the 64^3+ descents and long streamed sweeps whose
    compiled paths the multichip dryrun and the chip bench exercise
    every round anyway) are skipped unless ``VPOWER_SLOW=1``."""
    if os.environ.get("VPOWER_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier — opt-in via VPOWER_SLOW=1 (covered every "
               "round by the multichip dryrun + chip bench)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
