"""Per-pad GEOM train-step cost (multi-step dispatch, value-fetch
synchronised) — diagnoses why the bucketed GEOM ladder lands at 2.7x
instead of the pad^2 model's ~11x bound (VERDICT r3 task #5).

For each pad in the ladder + the flat pad, time K-step dispatch chunks at
the production batch and report ms/iter, plus the population-weighted
blended prediction for the bucketed loader.

Run on the real TPU:  python benchmarks/geom_pad_cost.py [k] [chunks]
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


def measure_pad(cfg_name, pad, batch, k=8, chunks=3, dropout=None):
    cfg = get_config(cfg_name)
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_size = 1024
    cfg.data.max_node = pad  # clip synthetic draw to the bucket
    cfg.tpu.pad_nodes = pad
    cfg.training.bucket_pads = ""  # flat at this pad
    cfg.training.batch_size = batch
    cfg.tpu.donate_state = True
    if dropout is not None:
        cfg.model.dropout = dropout
    parts = build_training(cfg, synthetic_fallback=True)
    state = init_state(cfg, parts)
    it = parts["loader"].infinite_sync() if hasattr(
        parts["loader"], "infinite_sync") else parts["loader"].infinite()
    raws = [next(it) for _ in range(k)]
    stacked = {kk: jnp.asarray(np.stack([r[kk] for r in raws]))
               for kk in raws[0]}
    key = jax.random.PRNGKey(0)
    multi = parts["multi_train_step"]
    t0 = time.perf_counter()
    state, m = multi(state, stacked, key)
    float(m["loss"])  # value fetch = real sync (BASELINE.md r3)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, m = multi(state, stacked, key)
        float(m["loss"])
    ms = (time.perf_counter() - t0) / (chunks * k) * 1e3
    print(f"pad={pad:4d} batch={batch:4d}: {ms:8.2f} ms/iter "
          f"({1e3 / ms:7.2f} it/s)  [compile {compile_s:.0f}s]", flush=True)
    return ms


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg_name = os.environ.get("JODO_PAD_CONFIG", "geom_uncond_jodo")
    batch = int(os.environ.get("JODO_PAD_BATCH", "16"))
    pads_env = os.environ.get("JODO_PADS", "48,64,96,128,184")
    pads = [int(p) for p in pads_env.split(",")]
    ms_by_pad = {}
    for pad in pads:
        ms_by_pad[pad] = measure_pad(cfg_name, pad, batch, k, chunks)

    # blended prediction for the bucketed loader: population-proportional
    # bucket draw over the dataset's size histogram
    from jodo_tpu.data.datasets_info import get_dataset_info

    info_name = get_config(cfg_name).data.info_name
    h = get_dataset_info(info_name)["train_n_nodes"]
    sizes = np.array(sorted(h))
    probs = np.array([h[s] for s in sizes], np.float64)
    probs /= probs.sum()
    ladder = sorted(ms_by_pad)
    blended = 0.0
    prev = 0
    for pad in ladder:
        share = probs[(sizes > prev) & (sizes <= pad)].sum()
        blended += share * ms_by_pad[pad]
        prev = pad
    flat = ms_by_pad[ladder[-1]]
    print(f"blended (population-weighted) {blended:.2f} ms/iter "
          f"-> predicted bucketed speedup {flat / blended:.2f}x vs flat "
          f"pad {ladder[-1]}", flush=True)


if __name__ == "__main__":
    main()
