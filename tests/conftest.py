"""Test harness: force an 8-device virtual CPU mesh.

The environment may pre-import JAX with a TPU plugin (via sitecustomize),
so plain env vars are too late; `jax.config.update` still works because the
backend is only initialised on first use. All tests run on CPU so they are
hermetic and exercise the same multi-device sharding paths the driver
validates via `dryrun_multichip`.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
