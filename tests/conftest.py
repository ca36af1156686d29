"""Test harness config: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (the real environment
has a single TPU chip); the driver separately dry-runs the multi-chip path.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered an accelerator
# plugin and overridden jax_platforms via jax.config — env vars alone are not
# enough.  Backends initialise lazily, so flipping the config here (before any
# array op) reliably pins tests to the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

# The suite is compile-bound (tiny shapes, many distinct programs — the
# renderpeople e2e test alone compiled for ~12 min); the persistent cache
# makes recompiles once-per-machine.  CPU compiles hit the local cache
# (unlike the tunneled-TPU path, see utils/compilation_cache.py).
from bodyfitting_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
