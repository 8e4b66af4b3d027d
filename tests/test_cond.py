"""Conditional-generation support: property prior, classifier training,
conditional train/eval pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from jodo_tpu import run_lib
from jodo_tpu.cond import DistributionProperty, compute_mean_mad
from jodo_tpu.cond.train_classifier import (
    build_classifier_training,
    make_classifier_train_step,
)
from jodo_tpu.configs import get_config


def test_property_distribution_sampling():
    rng = np.random.default_rng(0)
    num_atoms = rng.integers(5, 10, size=500)
    # property correlated with size
    vals = num_atoms * 2.0 + rng.normal(size=500)
    norm = {"alpha": compute_mean_mad(vals)}
    dist = DistributionProperty(num_atoms, vals.reshape(-1, 1), ["alpha"],
                                normalizer=norm)
    batch = dist.sample_batch([5, 9, 7])
    assert batch.shape == (3, 1)
    # samples should be denormalisable to near the conditional mean
    denorm = batch[:, 0] * norm["alpha"]["mad"] + norm["alpha"]["mean"]
    assert abs(denorm[0] - 10.0) < 4.0
    assert abs(denorm[1] - 18.0) < 4.0


def _tiny_cond_cfg():
    cfg = get_config("qm9_cond_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.data.max_node = 12
    cfg.tpu.pad_nodes = 16
    cfg.training.batch_size = 8
    cfg.optim.warmup = 5
    cfg.sampling.steps = 3
    return cfg


def test_classifier_training_step_decreases_loss():
    cfg = _tiny_cond_cfg()
    model, tx, loader, prop_norm, pad_n, _ = build_classifier_training(
        cfg, "alpha", lr=1e-3
    )
    raw = next(iter(loader.epoch()))
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["atom_one_hot"], batch["positions"],
        batch["node_mask"], batch["edge_mask"],
    )
    opt_state = tx.init(params)
    step = make_classifier_train_step(model, tx, prop_norm)
    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_conditional_multi_train_and_eval(tmp_path):
    """Two-property pipeline (vpsde_edge_cond_multi): train a few steps,
    then evaluate with per-property auto-trained classifiers — both MAEs
    must come back finite (reference run_lib.py:771-902, sampling.py:394-514)."""
    cfg = get_config("qm9_cond_multi_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.data.max_node = 12
    cfg.tpu.pad_nodes = 16
    cfg.training.batch_size = 8
    cfg.optim.warmup = 5
    cfg.sampling.steps = 3
    cfg.training.eval_samples = 0
    cfg.training.snapshot_freq = 4
    cfg.training.snapshot_freq_for_preemption = 4
    state, metrics = run_lib.run_train_loop(
        cfg, str(tmp_path), num_steps=4, sample_at_snapshot=False
    )
    assert np.isfinite(metrics["loss"])
    cfg.eval.batch_size = 8
    cfg.eval.num_samples = 8
    cfg.eval.ckpts = "1"
    cfg.eval.sub_geometry = False
    cfg.eval.classifier_train_steps = 60
    results = run_lib.evaluate(cfg, str(tmp_path))
    res = results[1]
    assert "property_mae_0" in res and np.isfinite(res["property_mae_0"])
    assert "property_mae_1" in res and np.isfinite(res["property_mae_1"])
    assert res["property_mae_classifiers"] == "auto_trained,auto_trained"


def test_conditional_train_and_eval(tmp_path):
    cfg = _tiny_cond_cfg()
    cfg.training.eval_samples = 8
    cfg.training.eval_batch_size = 8
    cfg.training.snapshot_freq = 4
    cfg.training.snapshot_freq_for_preemption = 4
    state, metrics = run_lib.run_train_loop(
        cfg, str(tmp_path), num_steps=4, sample_at_snapshot=False
    )
    assert np.isfinite(metrics["loss"])
    cfg.eval.batch_size = 8
    cfg.eval.num_samples = 8
    cfg.eval.ckpts = "1"
    cfg.eval.sub_geometry = False
    cfg.eval.classifier_train_steps = 60
    results = run_lib.evaluate(cfg, str(tmp_path))
    res = results[1]
    assert "property_mae_0" in res and np.isfinite(res["property_mae_0"])
    assert res["property_mae_classifiers"] == "auto_trained"
    assert 0.0 <= res["3D_atom_stable"] <= 1.0
    # the auto-trained classifier is cached: a second evaluate reuses it
    results2 = run_lib.evaluate(cfg, str(tmp_path))
    assert np.isfinite(results2[1]["property_mae_0"])
