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

# fast/slow tiers (VERDICT r1 weak #7: the full suite exceeds 10 min on
# this single-core host). Modules dominated by end-to-end runs or
# multiple full-model compiles are marked slow at collection; the fast
# tier (`pytest -m "not slow"`) stays under ~3 min. The FULL suite
# remains the merge gate.
SLOW_MODULES = {
    "test_attn_vjp",
    "test_bucketed",
    "test_cdgs_e2e",
    "test_compat",
    "test_cond",
    "test_graft_entry",
    "test_pallas_edge_chain_model",
    "test_pallas_block",
    "test_parallel",
    "test_parity",
    "test_parity_harness",
    "test_run_lib",
    "test_sampling",
    "test_serve",
    "test_training",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
