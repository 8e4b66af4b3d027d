"""Native collate: exact parity with the NumPy reference implementation."""

import numpy as np
import pytest

from jodo_tpu.data import synthetic_dataset
from jodo_tpu.data.core import collate_batch
from jodo_tpu import runtime


@pytest.mark.skipif(not runtime.NATIVE_AVAILABLE, reason="no native toolchain")
@pytest.mark.parametrize("compress,aromatic", [(True, False), (True, True), (False, False)])
def test_fast_collate_matches_numpy(compress, aromatic):
    data = synthetic_dataset("qm9_with_h", num_mols=40, seed=5)
    idx = np.asarray([3, 17, 0, 39, 21])
    props = np.arange(40, dtype=np.float64).reshape(40, 1)
    a = collate_batch(data, idx, 32, 5, compress, aromatic, 4, props)
    b = runtime.fast_collate(data, idx, 32, 5, compress, aromatic, 4, props)
    assert set(a.keys()) == set(b.keys())
    for k in a:
        np.testing.assert_allclose(a[k], b[k], err_msg=k, atol=0)


@pytest.mark.skipif(not runtime.NATIVE_AVAILABLE, reason="no native toolchain")
def test_fast_collate_speed():
    import time

    data = synthetic_dataset("qm9_with_h", num_mols=512, seed=6)
    idx = np.arange(256)
    t0 = time.perf_counter()
    for _ in range(5):
        collate_batch(data, idx, 32, 5)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        runtime.fast_collate(data, idx, 32, 5)
    t_cpp = time.perf_counter() - t0
    # native path should never be slower than 1.5x numpy (usually >>faster)
    assert t_cpp < t_np * 1.5
