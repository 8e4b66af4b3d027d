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


@pytest.fixture(scope="module")
def evaluated(trained):
    cfg, tmp, state, _ = trained
    cfg.eval.batch_size = 8
    cfg.eval.num_samples = 8
    cfg.eval.ckpts = "1"
    cfg.eval.sub_geometry = True
    cfg.eval.save_graph = True
    return run_lib.evaluate(cfg, str(tmp))


def test_evaluate_pipeline(trained, evaluated):
    cfg, tmp, state, _ = trained
    res = evaluated[1]
    assert 0.0 <= res["3D_mol_stable"] <= 1.0
    assert 0.0 <= res["2D_atom_stable"] <= 1.0
    assert res["mols_per_sec"] > 0
    assert "bond_length_mean" in res
    assert (tmp / "eval" / "ancestral_ckpt_1_42.pkl").exists()


def test_eval_pkl_rescore_agreement(trained, evaluated):
    """The saved pickle re-scored through the standalone eval_pkl CLI must
    reproduce evaluate()'s stability/validity numbers — the reference's
    cross-method oracle loop (eval_rdkit_pkl.py:45-150 -> run_lib.py
    save_graph pickles)."""
    from jodo_tpu import eval_pkl

    cfg, tmp, _, _ = trained
    res = evaluated[1]
    pkl = str(tmp / "eval" / "ancestral_ckpt_1_42.pkl")
    rescored = eval_pkl.main(["--pkl_path", pkl, "--type", "both"])
    for key in ("atom_stable", "mol_stable"):
        assert rescored["3D"][key] == pytest.approx(res[f"3D_{key}"])
        assert rescored["2D"][key] == pytest.approx(res[f"2D_{key}"])
    assert rescored["3D"]["Validity"] == pytest.approx(res["3D_Validity"])
    assert rescored["2D"]["Validity"] == pytest.approx(res["2D_Validity"])


def test_eval_pkl_allow_synthetic_full_agreement(trained, evaluated):
    """--allow_synthetic rebuilds the deterministic synthetic reference set
    so the reference-set-dependent metrics (FRGD, SNN, SA's fitted
    fragment table, novelty) agree with evaluate()'s too — without it they
    degrade to None/-1 (the real-dataset CLI never silently substitutes
    synthetic data)."""
    from jodo_tpu import eval_pkl

    cfg, tmp, _, _ = trained
    res = evaluated[1]
    pkl = str(tmp / "eval" / "ancestral_ckpt_1_42.pkl")
    rescored = eval_pkl.main([
        "--pkl_path", pkl, "--type", "both", "--allow_synthetic",
        "--synthetic_size", str(int(cfg.data.synthetic_size)),
        "--max_node", str(int(cfg.data.max_node)),
    ])
    assert rescored["3D"]["FCD"] == pytest.approx(res["FCD"])
    assert rescored["3D"]["SNN"] == pytest.approx(res["SNN"])
    assert rescored["3D"]["SA"] == pytest.approx(res["SA"])
    assert rescored["2D"]["Novelty"] == pytest.approx(res["2D_Novelty"])


def test_wall_budget_stops_loop_cleanly(tmp_path):
    """training.max_train_wall_s: the loop exits at the first chunk
    boundary past the budget — final_step < n_iters, a meta checkpoint
    exists for resume, and the budget does not charge compile warmup
    (the clock starts after it)."""
    cfg = tiny_train_cfg(tmp_path)
    cfg.training.n_iters = 10 ** 6
    cfg.training.log_freq = 10 ** 6
    cfg.training.snapshot_freq = 10 ** 6
    cfg.training.snapshot_freq_for_preemption = 10 ** 6
    cfg.training.snapshot_sampling = False
    cfg.training.max_train_wall_s = 1.5
    state, metrics = run_lib.run_train_loop(
        cfg, str(tmp_path), sample_at_snapshot=False
    )
    assert 0 < metrics["final_step"] < 10 ** 6
    assert int(state.step) > 0
    assert (tmp_path / "checkpoints-meta" / "state").exists()
