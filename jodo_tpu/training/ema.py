"""Exponential moving average of parameters as a pytree lerp.

Matches the reference ExponentialMovingAverage semantics (models/ema.py:4-86)
including the warmup-aware effective decay min(decay, (1+n)/(10+n)); runs
inside the jit-compiled train step (no host round trip per update).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_update"]


def ema_update(ema_params, params, decay: float, num_updates):
    """One EMA step. `num_updates` is the post-increment update count."""
    n = jnp.asarray(num_updates, jnp.float32)
    eff_decay = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - eff_decay
    return jax.tree.map(lambda s, p: s - one_minus * (s - p), ema_params, params)
