"""Diagnose multi-step dispatch cost: single-step loop vs scan(k) vs
scan(k, unroll) at QM9 full scale. Run on the real TPU."""

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
from jodo_tpu.training.step import _train_step_body, make_apply_fn


def main():
    cfg = get_config("qm9_uncond_jodo")
    cfg.data.allow_synthetic = True
    cfg.model.dropout = 0.0
    cfg.tpu.donate_state = True
    cfg.training.bucket_pads = ""  # flat pad: this probe feeds resident batches
    parts = build_training(cfg, synthetic_fallback=True)
    state0 = init_state(cfg, parts)
    it = parts["loader"].infinite()
    k = 8
    raws = [next(it) for _ in range(k)]
    batch1 = {kk: jnp.asarray(raws[0][kk]) for kk in raws[0]}
    stacked = {kk: jnp.asarray(np.stack([r[kk] for r in raws]))
               for kk in raws[0]}
    key = jax.random.PRNGKey(0)

    # (a) single-step jit, python loop (donated)
    single = parts["train_step"]
    state, m = single(state0, batch1, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(4 * k):
        state, m = single(state, batch1, key)
    lv = float(m["loss"])
    ms_single = (time.perf_counter() - t0) / (4 * k) * 1e3
    print(f"single-step loop        : {ms_single:7.2f} ms/iter loss={lv:.3f}",
          flush=True)

    bind = make_apply_fn(parts["model"], train=True)
    from jodo_tpu.training.optim import make_optimizer
    step_fn = _train_step_body(bind, parts["loss_fn"], parts["tx"],
                               cfg.model.ema_decay, cfg.optim.grad_clip)

    def make_multi(unroll):
        def multi(state, batches, key):
            keys = jax.random.split(key, k)

            def body(st, xs):
                b, kk2 = xs
                st, mm = step_fn(st, b, kk2)
                return st, mm["loss"]

            state, losses = jax.lax.scan(body, state, (batches, keys),
                                         unroll=unroll)
            return state, losses[-1]
        return jax.jit(multi, donate_argnums=(0,))

    for unroll in (1, 8):
        state = init_state(cfg, parts)
        multi = make_multi(unroll)
        state, l = multi(state, stacked, key)
        jax.block_until_ready(l)
        # async pipeline (block once at the end)
        t0 = time.perf_counter()
        for _ in range(8):
            state, l = multi(state, stacked, key)
        print(f"  [enqueue returned after {(time.perf_counter()-t0)*1e3:.1f} ms]")
        lv = float(l)
        ms = (time.perf_counter() - t0) / (8 * k) * 1e3
        # fully synchronous per-chunk
        t0 = time.perf_counter()
        for _ in range(4):
            state, l = multi(state, stacked, key)
            jax.block_until_ready(l)
        ms_sync = (time.perf_counter() - t0) / (4 * k) * 1e3
        print(f"scan k={k} unroll={unroll}: async {ms:7.2f} sync {ms_sync:7.2f}"
              f" ms/iter  loss={lv:.3f}", flush=True)


if __name__ == "__main__":
    main()
