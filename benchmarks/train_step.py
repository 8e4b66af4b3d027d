"""Train-step timing at QM9 full scale (batch 128, nf=256/8L).

Env: JODO_TRAIN_DTYPE (float32|bfloat16), JODO_TRAIN_STEPS (default 100),
JODO_TRAIN_PROFILE=/path to capture a trace.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jodo_tpu import run_lib
    from jodo_tpu.configs import get_config

    cfg = get_config("qm9_uncond_jodo")
    cfg.training.bucket_pads = ""  # flat pad: this probe feeds resident batches
    cfg.data.allow_synthetic = True
    cfg.model.dropout = 0.0
    cfg.tpu.compute_dtype = os.environ.get("JODO_TRAIN_DTYPE", "float32")
    cfg.tpu.use_pallas = os.environ.get("JODO_TRAIN_PALLAS", "0") == "1"
    cfg.training.batch_size = int(os.environ.get("JODO_TRAIN_BATCH", "128"))
    steps = int(os.environ.get("JODO_TRAIN_STEPS", "100"))

    parts = run_lib.build_training(cfg)
    state = run_lib.init_state(cfg, parts)
    it = parts["loader"].infinite()
    raw = next(it)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    key = jax.random.PRNGKey(0)

    state, m = parts["train_step"](state, batch, key)  # compile
    jax.block_until_ready(m["loss"])

    prof = os.environ.get("JODO_TRAIN_PROFILE")
    if prof:
        jax.profiler.start_trace(prof)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = parts["train_step"](state, batch, sub)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    if prof:
        jax.profiler.stop_trace()
    print(json.dumps({
        "dtype": cfg.tpu.compute_dtype,
        "pallas": cfg.tpu.use_pallas,
        "batch": cfg.training.batch_size,
        "ms_per_step": round(dt / steps * 1e3, 3),
        "iters_per_sec": round(steps / dt, 2),
    }))


if __name__ == "__main__":
    main()
