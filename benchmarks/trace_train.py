"""Capture an XLA device trace of ONE multi-step TRAIN dispatch at the
flagship config (dropout honest) and print the per-op time table —
VERDICT r3 task #6: name the top-5 train-step time sinks.

Usage: python benchmarks/trace_train.py [k] [dropout] [remat(0|1)]
Env: JODO_TRACE_CONFIG (default qm9_uncond_jodo), JODO_TRACE_BATCH,
JODO_TRACE_PAD.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from trace_step import parse_xplane  # noqa: E402

from jodo_tpu.configs import get_config  # noqa: E402
from jodo_tpu.run_lib import build_training, init_state  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dropout = float(sys.argv[2]) if len(sys.argv) > 2 else None
    remat = sys.argv[3] if len(sys.argv) > 3 else None
    cfg_name = os.environ.get("JODO_TRACE_CONFIG", "qm9_uncond_jodo")

    cfg = get_config(cfg_name)
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_size = 1024
    cfg.tpu.donate_state = True
    if os.environ.get("JODO_TRACE_BATCH"):
        cfg.training.batch_size = int(os.environ["JODO_TRACE_BATCH"])
    if os.environ.get("JODO_TRACE_PAD"):
        pad = int(os.environ["JODO_TRACE_PAD"])
        cfg.data.max_node = pad
        cfg.tpu.pad_nodes = pad
    cfg.training.bucket_pads = ""  # flat: trace one shape
    if dropout is not None:
        cfg.model.dropout = dropout
    if remat is not None:
        cfg.tpu.remat_attn = bool(int(remat))

    parts = build_training(cfg, synthetic_fallback=True)
    state = init_state(cfg, parts)
    it = parts["loader"].infinite_sync() if hasattr(
        parts["loader"], "infinite_sync") else parts["loader"].infinite()
    raws = [next(it) for _ in range(k)]
    stacked = {kk: jnp.asarray(np.stack([r[kk] for r in raws]))
               for kk in raws[0]}
    key = jax.random.PRNGKey(0)
    multi = parts["multi_train_step"]
    state, m = multi(state, stacked, key)
    float(m["loss"])  # compile + warm (value fetch = real sync)

    t0 = time.perf_counter()
    state, m = multi(state, stacked, key)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / k * 1e3
    print(f"train step: {ms:.2f} ms/iter ({1e3 / ms:.2f} it/s) at "
          f"batch={cfg.training.batch_size} pad={cfg.tpu.pad_nodes} "
          f"dropout={cfg.model.dropout} remat={cfg.tpu.remat_attn} k={k}",
          flush=True)

    logdir = f"/tmp/trace_train_{cfg_name}_{k}"
    with jax.profiler.trace(logdir):
        state, m = multi(state, stacked, key)
        float(m["loss"])
    parse_xplane(logdir, topk=int(os.environ.get("JODO_TRACE_TOPK", "35")))


if __name__ == "__main__":
    main()
