"""Train state pytree: params, EMA shadow, optimizer + clip state, step.

Serialized whole by Orbax for the meta/numbered checkpoint scheme the
reference uses (utils.py:7-30, run_lib.py:112-120).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .optim import ClipState, init_clip_state


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    clip_state: ClipState

    @staticmethod
    def create(params, tx) -> "TrainState":
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=tx.init(params),
            clip_state=init_clip_state(),
        )
