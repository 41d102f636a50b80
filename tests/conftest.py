"""Test configuration: force an 8-device virtual CPU platform.

Tests exercise multi-device sharding without TPU hardware by asking XLA for 8
virtual host devices. The XLA flag must be set before the backend initializes;
the platform override must go through jax.config because the environment's
jax plugin re-pins ``jax_platforms`` at import time.

Exception: with ``GISNAV_TPU_PARITY=1`` the platform is left alone so
``tests/test_tpu_parity.py`` can compare the Pallas kernels against their
XLA references on the real TPU backend (all other modules then skip).
"""
import os

_TPU_PARITY = bool(os.environ.get("GISNAV_TPU_PARITY"))

if not _TPU_PARITY:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

if not _TPU_PARITY:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
from gisnav_tpu.utils.jitcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _TPU_PARITY:
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()


def pytest_collection_modifyitems(config, items):
    if _TPU_PARITY:
        skip = pytest.mark.skip(
            reason="GISNAV_TPU_PARITY runs only test_tpu_parity.py"
        )
        for item in items:
            if "test_tpu_parity" not in item.nodeid:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
