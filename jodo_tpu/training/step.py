"""The jit-compiled train/eval step and its data-parallel sharding.

One XLA program per step: forward diffusion, (conditional) self-cond teacher
pass, model fwd+bwd, adaptive clip, optimizer, EMA — replacing the
reference's Python step closure (losses.py:97-125).

Data parallelism: parameters replicated, batch sharded over a 1-D 'data'
mesh; XLA inserts the psum for gradients (the TPU-native replacement of
torch.nn.DataParallel, models/utils.py:27).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ema import ema_update
from .optim import adaptive_clip
from .state import TrainState

__all__ = ["make_apply_fn", "make_train_step", "make_eval_step", "shard_batch"]


def make_apply_fn(model, train: bool):
    """Bind the model into the loss-fn calling convention.

    Returns apply_fn(params)(t, xh, nm, em, edge_x, noise_level, cond_x,
    cond_edge_x, cond_flag, context, dropout_key)."""

    def bound(params):
        def apply_fn(
            t, xh, nm, em, edge_x, noise_level,
            cond_x=None, cond_edge_x=None, cond_flag=0.0, context=None,
            dropout_key=None,
        ):
            rngs = None
            if train and dropout_key is not None:
                rngs = {"dropout": dropout_key}
            return model.apply(
                params, t, xh, nm, em, edge_x, noise_level,
                cond_x=cond_x, cond_edge_x=cond_edge_x, cond_flag=cond_flag,
                context=context, deterministic=not train, rngs=rngs,
            )

        return apply_fn

    return bound


def _train_step_body(bind, loss_fn, tx, ema_decay, grad_clip):
    def train_step(state: TrainState, batch, key):
        def objective(params):
            return loss_fn(bind(params), key, batch)

        loss, grads = jax.value_and_grad(objective)(state.params)
        grads, clip_state, grad_norm = adaptive_clip(
            grads, state.clip_state, grad_clip
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_step = state.step + 1
        ema_params = ema_update(state.ema_params, params, ema_decay, new_step)
        new_state = TrainState(
            step=new_step,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            clip_state=clip_state,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics

    return train_step


def make_train_step(model, loss_fn, tx, ema_decay: float, grad_clip: float,
                    donate: bool = True) -> Callable:
    """Returns jitted train_step(state, batch, key) -> (state, metrics)."""
    bind = make_apply_fn(model, train=True)
    train_step = _train_step_body(bind, loss_fn, tx, ema_decay, grad_clip)
    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_multi_train_step(model, loss_fn, tx, ema_decay: float,
                          grad_clip: float, donate: bool = True) -> Callable:
    """Returns jitted multi_step(state, batches, key) -> (state, metrics):
    a `lax.scan` over K chained train steps in ONE device dispatch.

    `batches` is the single-step batch pytree with a leading [K] axis.
    Per-step PRNG keys are split from `key` inside the program. Metrics
    report the LAST step's loss (matching the single-step loop's logging)
    plus the chunk mean.

    Why: the reference-style one-dispatch-per-step loop pays host->device
    dispatch latency every step (over a remote/tunneled TPU this dominates:
    ~200 ms/step vs 15 ms of compute at QM9 scale). Scanning K steps per
    dispatch amortises it K-fold; K is `config.training.steps_per_dispatch`.
    """
    bind = make_apply_fn(model, train=True)
    step_fn = _train_step_body(bind, loss_fn, tx, ema_decay, grad_clip)

    def multi_step(state: TrainState, batches, key):
        k = jax.tree.leaves(batches)[0].shape[0]
        keys = jax.random.split(key, k)

        def body(st, xs):
            b, kk = xs
            st, m = step_fn(st, b, kk)
            return st, (m["loss"], m["grad_norm"])

        state, (losses, norms) = jax.lax.scan(body, state, (batches, keys))
        metrics = {"loss": losses[-1], "grad_norm": norms[-1],
                   "loss_mean": jnp.mean(losses)}
        return state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_step, donate_argnums=donate_argnums)


def make_eval_step(model, loss_fn) -> Callable:
    """EMA-parameter eval loss (reference step_fn eval branch,
    losses.py:116-122)."""
    bind = make_apply_fn(model, train=False)

    def eval_step(state: TrainState, batch, key):
        return loss_fn(bind(state.ema_params), key, batch)

    return jax.jit(eval_step)


def shard_batch(batch, mesh: Optional[Mesh]):
    """Place a host batch with the leading axis sharded over the 'data'
    mesh axis (no-op without a mesh)."""
    if mesh is None:
        return batch
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        ),
        batch,
    )
