"""Test configuration: force an 8-device virtual CPU mesh.

The TPU-native analog of "testing multi-node without a cluster"
(SURVEY.md §4): all tests run on CPU with 8 virtual XLA devices so
sharding/collective code paths compile and execute without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-import jax with a TPU plugin platform pinned via
# JAX_PLATFORMS before conftest runs; jax.config.update overrides it as long
# as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
