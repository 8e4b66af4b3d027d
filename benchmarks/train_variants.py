"""Honest (fully synchronous) training-step timings across variants.

History: r2's per-step timings were taken by enqueueing a Python loop of
dispatches and blocking once at the end — over the axon tunnel that
measures the ENQUEUE rate, not device throughput (r3 discovery, see
BASELINE.md). This script times scan-chunked dispatches with a
block_until_ready after every chunk.

Run on the real TPU:  python benchmarks/train_variants.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jodo_tpu.configs import get_config
from jodo_tpu.run_lib import build_training, init_state


def measure(dtype, remat, k=8, chunks=4):
    cfg = get_config("qm9_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.dropout = 0.0
    cfg.tpu.donate_state = True
    cfg.training.bucket_pads = ""  # flat pad: this probe feeds resident batches
    cfg.tpu.compute_dtype = dtype
    cfg.tpu.remat_attn = remat
    parts = build_training(cfg, synthetic_fallback=True)
    state = init_state(cfg, parts)
    it = parts["loader"].infinite()
    raws = [next(it) for _ in range(k)]
    stacked = {kk: jnp.asarray(np.stack([r[kk] for r in raws]))
               for kk in raws[0]}
    key = jax.random.PRNGKey(0)
    multi = parts["multi_train_step"]
    state, m = multi(state, stacked, key)
    float(m["loss"])  # block_until_ready is NOT reliable over the axon
    t0 = time.perf_counter()  # tunnel; a value fetch is (BASELINE.md r3)
    for _ in range(chunks):
        state, m = multi(state, stacked, key)
        float(m["loss"])
    ms = (time.perf_counter() - t0) / (chunks * k) * 1e3
    print(f"dtype={dtype:9s} remat={remat}: {ms:7.2f} ms/iter "
          f"({1e3 / ms:.2f} it/s)", flush=True)
    return ms


def main():
    measure("bfloat16", True)
    measure("bfloat16", False)
    measure("float32", True)


if __name__ == "__main__":
    main()
