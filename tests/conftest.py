"""Test configuration: force an 8-device virtual CPU platform.

Tests exercise multi-device sharding without TPU hardware by asking XLA for 8
virtual host devices. The XLA flag must be set before the backend initializes;
the platform override must go through jax.config because the environment's
jax plugin re-pins ``jax_platforms`` at import time.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
