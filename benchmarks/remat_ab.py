"""Train-step remat A/B at QM9 flagship scale with honest dropout
(VERDICT r3 task #6: land one winning change against the ~13 ms/step
dropout-mask traffic).

Variants: remat_attn x remat_ffn, dropout 0.1, rbg keys, bf16,
multi-step dispatch, value-fetch synchronised. Also reports dropout 0.0
for the baseline delta.

Run on the real TPU:  python benchmarks/remat_ab.py [k] [chunks]
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


def measure(label, dropout, remat_attn, remat_ffn, k=8, chunks=4):
    cfg = get_config("qm9_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.dropout = dropout
    cfg.tpu.donate_state = True
    cfg.tpu.remat_attn = remat_attn
    cfg.tpu.remat_ffn = remat_ffn
    cfg.training.bucket_pads = ""  # flat pad: resident-batch probe
    parts = build_training(cfg, synthetic_fallback=True)
    state = init_state(cfg, parts)
    it = parts["loader"].infinite()
    raws = [next(it) for _ in range(k)]
    stacked = {kk: jnp.asarray(np.stack([r[kk] for r in raws]))
               for kk in raws[0]}
    key = jax.random.key(0, impl="rbg")
    multi = parts["multi_train_step"]
    state, m = multi(state, stacked, key)
    float(m["loss"])  # value fetch = the only reliable sync over axon
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, m = multi(state, stacked, key)
        float(m["loss"])
    ms = (time.perf_counter() - t0) / (chunks * k) * 1e3
    print(f"{label:40s}: {ms:7.2f} ms/iter ({1e3 / ms:.2f} it/s)",
          flush=True)
    return ms


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    measure("dropout .1  no remat (r3 default)", 0.1, False, False, k, chunks)
    measure("dropout .1  remat_ffn", 0.1, False, True, k, chunks)
    measure("dropout .1  remat_attn", 0.1, True, False, k, chunks)
    measure("dropout .1  remat_attn+ffn", 0.1, True, True, k, chunks)
    measure("dropout 0   no remat (ceiling)", 0.0, False, False, k, chunks)
    measure("dropout 0   remat_ffn", 0.0, False, True, k, chunks)


if __name__ == "__main__":
    main()
