"""CDGS experiment end-to-end: train (noise-prediction loss) + sample."""

import numpy as np
import pytest

from jodo_tpu import run_lib
from jodo_tpu.configs import get_config


def test_cdgs_train_and_sample(tmp_path):
    cfg = get_config("qm9_2d_cdgs")
    cfg.data.allow_synthetic = True
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.model.rw_depth = 3
    cfg.data.max_node = 12
    cfg.tpu.pad_nodes = 16
    cfg.training.batch_size = 8
    cfg.training.eval_batch_size = 8
    cfg.training.eval_samples = 8
    cfg.training.snapshot_freq = 4
    cfg.training.snapshot_freq_for_preemption = 4
    cfg.sampling.steps = 3
    cfg.optim.warmup = 2

    state, metrics = run_lib.run_train_loop(
        cfg, str(tmp_path), num_steps=4, sample_at_snapshot=True
    )
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["eval_loss"])

    cfg.eval.batch_size = 8
    cfg.eval.num_samples = 8
    cfg.eval.ckpts = "1"
    results = run_lib.evaluate(cfg, str(tmp_path))
    res = results[1]
    assert 0.0 <= res["2D_atom_stable"] <= 1.0
    assert res["mols_per_sec"] > 0
