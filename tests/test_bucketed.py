"""Bucketed-training tests (train-side pad ladder, VERDICT r1 #2).

The loss itself is padding-invariant (tests/test_invariances.py), so the
contract here is: the bucketed loader partitions the data correctly,
emits same-pad chunks of the right shapes with population-proportional
bucket sampling, and the multi-step train dispatch runs at bucket pads
end-to-end through run_train_loop.
"""

import numpy as np
import pytest

from jodo_tpu.configs import get_config
from jodo_tpu.data import (
    BucketedLoader,
    get_dataset,
    make_bucketed_loader,
)


def _cfg():
    cfg = get_config("qm9_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.n_extra_heads = 2
    cfg.training.batch_size = 8
    cfg.training.steps_per_dispatch = 4
    cfg.training.bucket_pads = "16,24"
    return cfg


@pytest.fixture(scope="module")
def train_ds():
    cfg = _cfg()
    train, _val, _test, _info = get_dataset(cfg, synthetic_fallback=True)
    return train


def test_bucket_partition_and_shapes(train_ds):
    cfg = _cfg()
    loader = make_bucketed_loader(cfg, train_ds, [16, 24, 32], 8, seed=0)
    sizes = np.asarray(train_ds.n_nodes)
    assert sizes.max() <= 32
    total = sum(len(loader.loaders[p].indices) for p in loader.pads)
    assert total == len(train_ds)
    for pad in loader.pads:
        idx = loader.loaders[pad].indices
        assert (sizes[idx] <= pad).all()
    # compact int8-coded chunks (the default since compact_batches=True);
    # the dense expansion happens on device (data/process.py)
    for _ in range(6):
        pad, chunk = loader.next_chunk(4)
        assert pad in loader.pads
        assert chunk["atom_types"].shape == (4, 8, pad)
        assert chunk["bond_code"].shape == (4, 8, pad, pad)
        assert chunk["n_nodes"].shape == (4, 8)
    pad, single = loader.next_chunk(1)
    assert single["atom_types"].shape == (8, pad)

    dense = make_bucketed_loader(cfg, train_ds, [16, 24, 32], 8, seed=0,
                                 compact=False)
    pad, chunk = dense.next_chunk(2)
    assert chunk["atom_one_hot"].shape[:3] == (2, 8, pad)
    assert chunk["edge_one_hot"].shape[2:4] == (pad, pad)
    assert chunk["node_mask"].shape == (2, 8, pad)


def test_bucket_sampling_proportional(train_ds):
    cfg = _cfg()
    loader = make_bucketed_loader(cfg, train_ds, [16, 24, 32], 8, seed=0)
    draws = [loader.next_chunk(1)[0] for _ in range(300)]
    freq = {p: draws.count(p) / len(draws) for p in loader.pads}
    for p, wt in zip(loader.pads, loader.weights):
        assert abs(freq[p] - wt) < 0.12


def test_bucket_ladder_must_cover_max(train_ds):
    cfg = _cfg()
    with pytest.raises(ValueError):
        make_bucketed_loader(cfg, train_ds, [8], 8, seed=0)


def test_train_loop_bucketed_smoke(tmp_path, caplog):
    """run_train_loop with bucket_pads on: runs chunks at bucket pads,
    logs and checkpoints; loss finite; the per-pad compile warmup FIRES
    at a fresh start (the r4 gate bug left every bucket program to
    compile lazily inside the throughput timing window)."""
    import logging

    from jodo_tpu import run_lib

    cfg = _cfg()
    cfg.training.n_iters = 8
    cfg.training.log_freq = 4
    cfg.training.snapshot_freq = 8
    cfg.training.snapshot_freq_for_preemption = 8
    cfg.training.eval_freq = 0
    cfg.training.snapshot_sampling = False
    cfg.sampling.steps = 4

    parts = run_lib.build_training(cfg, synthetic_fallback=True)
    assert isinstance(parts["loader"], BucketedLoader)
    with caplog.at_level(logging.INFO):
        state, metrics = run_lib.run_train_loop(cfg, str(tmp_path),
                                                parts=parts)
    assert any("compile warmup" in r.message for r in caplog.records), (
        "per-pad warmup must pre-compile recurring chunk programs at a "
        "fresh start")
    assert np.isfinite(metrics.get("loss", np.nan))
    # per-pad step accounting (honest bucketed MFU in bench) covers every
    # executed step and only uses ladder pads
    pad_steps = metrics.get("pad_steps")
    assert pad_steps, "bucketed loop must report pad_steps"
    assert set(pad_steps) <= set(parts["loader"].pads)
    assert sum(pad_steps.values()) == cfg.training.n_iters + 1  # steps 0..n


def test_bucket_batch_scale(train_ds):
    """Per-bucket batch scaling (VERDICT r3 task #5): small pads draw
    ~(pad_max/pad)^2-larger batches (capped, multiple of 8, never below
    base), stratum weights stay population-proportional, and chunk shapes
    carry each bucket's own batch size."""
    cfg = _cfg()
    cfg.training.bucket_batch_scale = 4.0
    loader = make_bucketed_loader(cfg, train_ds, [16, 24, 32], 8, seed=0)
    for pad in loader.pads:
        expect = max(8, int(8 * min(4.0, (32 / pad) ** 2)) // 8 * 8)
        assert loader.batch_sizes[pad] == expect
        chunk = loader.chunk_for_pad(pad, 2)
        assert chunk["atom_types"].shape == (2, loader.batch_sizes[pad], pad)
    # pad 16 hits the cap (scale 4 -> batch 32), pad 32 stays at base
    if 16 in loader.batch_sizes:
        assert loader.batch_sizes[16] == 32
    assert loader.batch_sizes[loader.pads[-1]] == 8
    # cap 1.0 (default) leaves every bucket at the base batch
    cfg.training.bucket_batch_scale = 1.0
    flat = make_bucketed_loader(cfg, train_ds, [16, 24, 32], 8, seed=0)
    assert all(b == 8 for b in flat.batch_sizes.values())
    # population-proportional selection is independent of batch scaling:
    # compare against the truly UNSCALED loader (the old comparison
    # loader was built with scale still at 4.0, so it compared two
    # identically scaled loaders — ADVICE r4). Realized pads must match
    # first: scaled fold-up thresholds could change bucket composition.
    assert flat.pads == loader.pads
    np.testing.assert_allclose(loader.weights, flat.weights)
