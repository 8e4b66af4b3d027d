"""Optimizer + EDM-style adaptive gradient clipping, fully on-device.

Reference semantics (losses.py:14-94):
  * Adam(beta1, 0.999) or AdamW(amsgrad, weight_decay=1e-12)
  * linear LR warmup lr * min(step/warmup, 1)
  * adaptive clip: allow 1.5*mean + 2*std of the last-50 grad-norm history,
    capped at grad_clip; plain clip when grad_clip <= 1; the clipped value
    (not the raw norm) is pushed when clipping fired.

The reference's Python Queue becomes a fixed [50] ring buffer carried in the
train state so the whole thing stays inside one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["make_optimizer", "ClipState", "init_clip_state", "adaptive_clip"]

QUEUE_LEN = 50


def make_optimizer(config) -> optax.GradientTransformation:
    opt = config.optim
    warmup = float(opt.warmup)
    base_lr = float(opt.lr)

    def lr_schedule(step):
        if warmup > 0:
            return base_lr * jnp.minimum(step / warmup, 1.0)
        return base_lr

    if opt.optimizer == "Adam":
        # torch Adam couples L2 into the gradient BEFORE the moment
        # estimates (losses.py:14-25 uses torch.optim.Adam); decoupled
        # decay here would be AdamW semantics. Inert at wd=0 (all shipped
        # configs) but kept coupled for checkpoint-for-checkpoint parity.
        return optax.chain(
            optax.add_decayed_weights(opt.weight_decay),
            optax.scale_by_adam(b1=opt.beta1, b2=0.999, eps=opt.eps),
            optax.scale_by_learning_rate(lr_schedule),
        )
    if opt.optimizer == "AdamW":
        return optax.chain(
            optax.scale_by_amsgrad(b1=opt.beta1, b2=0.999, eps=opt.eps),
            optax.add_decayed_weights(1e-12),
            optax.scale_by_learning_rate(lr_schedule),
        )
    raise ValueError(f"Optimizer {opt.optimizer} not supported")


class ClipState(NamedTuple):
    buffer: jnp.ndarray  # [QUEUE_LEN] recent grad norms (ring)
    count: jnp.ndarray  # [] int32 number of valid entries
    ptr: jnp.ndarray  # [] int32 next write slot


def init_clip_state() -> ClipState:
    # seeded with one large value that is flushed quickly (losses.py:79)
    buf = jnp.zeros((QUEUE_LEN,), jnp.float32).at[0].set(3000.0)
    return ClipState(buf, jnp.asarray(1, jnp.int32), jnp.asarray(1, jnp.int32))


def _queue_stats(state: ClipState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    valid = (jnp.arange(QUEUE_LEN) < state.count).astype(jnp.float32)
    cnt = jnp.maximum(state.count.astype(jnp.float32), 1.0)
    mean = jnp.sum(state.buffer * valid) / cnt
    var = jnp.sum(valid * (state.buffer - mean) ** 2) / cnt
    return mean, jnp.sqrt(var)


def _queue_push(state: ClipState, value) -> ClipState:
    buf = state.buffer.at[state.ptr % QUEUE_LEN].set(value)
    return ClipState(
        buf,
        jnp.minimum(state.count + 1, QUEUE_LEN),
        (state.ptr + 1) % QUEUE_LEN,
    )


def adaptive_clip(grads, clip_state: ClipState, max_grad: float):
    """Clip grads by global norm with the EDM adaptive threshold.

    Returns (clipped_grads, new_clip_state, grad_norm)."""
    grad_norm = optax.global_norm(grads)

    if max_grad <= 1.0:
        scale = jnp.minimum(1.0, max_grad / (grad_norm + 1e-6))
        return jax.tree.map(lambda g: g * scale, grads), clip_state, grad_norm

    mean, std = _queue_stats(clip_state)
    max_grad_norm = jnp.minimum(1.5 * mean + 2.0 * std, max_grad)
    scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-6))
    clipped = jax.tree.map(lambda g: g * scale, grads)
    pushed = jnp.minimum(grad_norm, max_grad_norm)
    return clipped, _queue_push(clip_state, pushed), grad_norm
