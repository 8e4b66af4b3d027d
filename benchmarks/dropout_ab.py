"""Dropout-cost / PRNG-impl A/B on the flagship train step.

The flagship run trains with dropout=0.1 (reference
configs/vpsde_qm9_uncond_jodo.py:51) but every prior "device-bound"
training number was measured at dropout=0.0 — the real loop's 11.6 it/s
vs the 15.5 it/s bench rate is suspected to be threefry mask generation
(~270M bernoulli draws/step: edge-FFN masks [B,N,N,128] x2 x8 layers +
attention alpha masks). This times the honest scan-chunked step across
{dropout 0.0, dropout 0.1 + threefry, dropout 0.1 + rbg} — value-fetch
synchronised (BASELINE.md r3 measurement-artifact note).

Run on the real TPU:  python benchmarks/dropout_ab.py
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


def measure(label, dropout, impl, k=8, chunks=4):
    cfg = get_config("qm9_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.dropout = dropout
    cfg.tpu.donate_state = True
    cfg.training.bucket_pads = ""  # flat pad: this probe feeds resident batches
    parts = build_training(cfg, synthetic_fallback=True)
    state = init_state(cfg, parts)
    it = parts["loader"].infinite()
    raws = [next(it) for _ in range(k)]
    stacked = {kk: jnp.asarray(np.stack([r[kk] for r in raws]))
               for kk in raws[0]}
    key = jax.random.key(0, impl=impl)
    multi = parts["multi_train_step"]
    state, m = multi(state, stacked, key)
    float(m["loss"])  # value fetch = the only reliable sync over axon
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, m = multi(state, stacked, key)
        float(m["loss"])
    ms = (time.perf_counter() - t0) / (chunks * k) * 1e3
    print(f"{label:28s}: {ms:7.2f} ms/iter ({1e3 / ms:.2f} it/s)",
          flush=True)
    return ms


def main():
    measure("dropout 0.0", 0.0, "threefry2x32")
    measure("dropout 0.1, threefry", 0.1, "threefry2x32")
    measure("dropout 0.1, rbg", 0.1, "rbg")


if __name__ == "__main__":
    main()
