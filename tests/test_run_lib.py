"""End-to-end: train a tiny model on synthetic QM9, snapshot-sample, eval."""

import logging

import numpy as np
import pytest

from jodo_tpu import run_lib
from jodo_tpu.configs import get_config


def tiny_train_cfg(tmp):
    cfg = get_config("qm9_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.data.max_node = 12
    cfg.tpu.pad_nodes = 16
    cfg.training.batch_size = 8
    cfg.training.eval_batch_size = 8
    cfg.training.eval_samples = 8
    cfg.training.log_freq = 5
    cfg.training.snapshot_freq = 10
    cfg.training.snapshot_freq_for_preemption = 10
    cfg.sampling.steps = 4
    cfg.optim.warmup = 5
    return cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    cfg = tiny_train_cfg(tmp)
    state, metrics = run_lib.run_train_loop(cfg, str(tmp), num_steps=10)
    return cfg, tmp, state, metrics


def test_train_loop_end_to_end(trained):
    cfg, tmp, state, metrics = trained
    assert int(state.step) == 11  # inclusive loop, reference-parity
    assert np.isfinite(metrics["loss"])
    # meta + numbered checkpoints exist
    assert (tmp / "checkpoints-meta" / "state").exists()
    assert (tmp / "checkpoints" / "checkpoint_1").exists()


def test_resume_from_meta(trained):
    cfg, tmp, state, _ = trained
    # a fresh loop restores step 10 and continues to 12
    state2, _ = run_lib.run_train_loop(
        cfg, str(tmp), num_steps=12, sample_at_snapshot=False
    )
    assert int(state2.step) == 13


def test_evaluate_pipeline(trained):
    cfg, tmp, state, _ = trained
    cfg.eval.batch_size = 8
    cfg.eval.num_samples = 8
    cfg.eval.ckpts = "1"
    cfg.eval.sub_geometry = True
    cfg.eval.save_graph = True
    results = run_lib.evaluate(cfg, str(tmp))
    res = results[1]
    assert 0.0 <= res["3D_mol_stable"] <= 1.0
    assert 0.0 <= res["2D_atom_stable"] <= 1.0
    assert res["mols_per_sec"] > 0
    assert "bond_length_mean" in res
    assert (tmp / "eval" / "ancestral_ckpt_1_42.pkl").exists()
