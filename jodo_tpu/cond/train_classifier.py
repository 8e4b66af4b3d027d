"""Train the EGNN property regressor used for conditional-generation MAE.

The reference downloads pretrained torch EGNN classifiers
(cond_gen/model.py:15-23, run_lib.py:656-660); this utility trains the
flax EGNNRegressor in-framework on the property-model half of QM9
(reference protocol: the classifier trains on the half the generator does
NOT train on), so the conditional evaluation stack is self-sufficient.

  python -m jodo_tpu.cond.train_classifier --property alpha \
      --workdir runs/clf_alpha [--steps 200000]
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import get_config, pad_nodes
from ..data import get_dataset, make_loader
from ..data.ingest import compute_property_values
from ..models.egnn import EGNNRegressor
from ..training.checkpoint import CheckpointManager
from .property_distribution import compute_mean_mad

PROP2IDX = {"mu": 0, "alpha": 1, "homo": 2, "lumo": 3, "gap": 4, "Cv": 11}


def build_classifier_training(config, prop: str, lr: float = 1e-4,
                              synthetic_fallback: bool = None):
    """Returns (model, tx, loader, prop_norm, pad_n, eval data)."""
    pad_n = pad_nodes(config)
    if synthetic_fallback is None:
        synthetic_fallback = bool(config.data.get("allow_synthetic", False))
    first_train, second_train, valid, test, info = get_dataset(
        config, synthetic_fallback=synthetic_fallback
    )
    # classifier trains on the FIRST half (the generator uses the second)
    values = compute_property_values(first_train, PROP2IDX[prop])
    prop_norm = compute_mean_mad(values)
    loader = make_loader(
        config, first_train, pad_n, config.training.batch_size,
        property_values=values.reshape(-1, 1), seed=config.seed,
        compact=False,  # EGNN step consumes the dense keys directly
    )
    model = EGNNRegressor(in_node_nf=config.data.atom_types)
    # short auto-train budgets need a stable recipe: global-norm clipping
    # plus linear warmup into cosine decay (the reference instead ships
    # classifiers pretrained for ~1000 epochs, cond_gen/model.py:15-23)
    steps = int(config.eval.get("classifier_train_steps", 2000) or 2000)
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=max(10, steps // 20),
        decay_steps=steps, end_value=lr * 0.1,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=1e-16),
    )
    return model, tx, loader, prop_norm, pad_n, (valid, test, info)


def make_classifier_train_step(model, tx, prop_norm):
    mean, mad = prop_norm["mean"], prop_norm["mad"]

    def loss_fn(params, batch):
        pred = model.apply(
            params, batch["atom_one_hot"], batch["positions"],
            batch["node_mask"], batch["edge_mask"],
        )
        target = (batch["context"][:, 0] - mean) / mad
        return jnp.mean(jnp.abs(pred - target))

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_classifier(config, prop: str, workdir: str, steps: int = 200000,
                     log_freq: int = 500, lr: float = 1e-4,
                     synthetic_fallback: bool = None):
    model, tx, loader, prop_norm, pad_n, _ = build_classifier_training(
        config, prop, lr, synthetic_fallback
    )
    raw = next(iter(loader.epoch()))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(config.seed),
        jnp.asarray(raw["atom_one_hot"]), jnp.asarray(raw["positions"]),
        jnp.asarray(raw["node_mask"]), jnp.asarray(raw["edge_mask"]),
    )
    opt_state = tx.init(params)
    step_fn = make_classifier_train_step(model, tx, prop_norm)

    ckpt = CheckpointManager(workdir)
    it = loader.infinite()
    loss = None
    for step in range(steps):
        raw = next(it)
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        params, opt_state, loss = step_fn(params, opt_state, batch)
        if step % log_freq == 0:
            logging.info("classifier step %d loss(normalised MAE): %.5f",
                         step, float(loss))
    ckpt.save_meta({
        "params": params,
        "prop_norm": {k: np.asarray(v) for k, v in prop_norm.items()},
    })
    return params, prop_norm, float(loss)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--property", default="alpha", choices=sorted(PROP2IDX))
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--steps", type=int, default=200000)
    parser.add_argument("--lr", type=float, default=1e-4)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = get_config("qm9_cond_jodo")
    cfg.cond_property = args.property
    train_classifier(cfg, args.property, args.workdir, steps=args.steps,
                     lr=args.lr)


if __name__ == "__main__":
    main()
