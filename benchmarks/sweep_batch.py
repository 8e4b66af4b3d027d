"""Sampling batch-size sweep (VERDICT r1 item 2b).

Measures scan-amortised per-step cost of the QM9 flagship ancestral round
at pad N=32 across batch sizes, and prints mols/s @1000 and @50 steps.
Run on the real TPU:  python benchmarks/sweep_batch.py
Env: JODO_SWEEP_BATCHES (csv), JODO_SWEEP_STEPS (default 200).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jodo_tpu.configs import get_config
    from jodo_tpu.data.datasets_info import QM9_WITH_H
    from jodo_tpu.diffusion import NoiseSchedule
    from jodo_tpu.models import create_model, get_node_dist
    from jodo_tpu.sampling import make_round_fn

    batches = [
        int(x)
        for x in os.environ.get(
            "JODO_SWEEP_BATCHES", "128,256,512,1024,2048,4096"
        ).split(",")
    ]
    steps = int(os.environ.get("JODO_SWEEP_STEPS", "200"))
    pad_n = 32

    cfg = get_config("qm9_uncond_jodo")
    cfg.sampling.steps = steps
    cfg.model.dropout = 0.0
    cfg.tpu.compute_dtype = os.environ.get("JODO_BENCH_DTYPE", "bfloat16")
    cfg.tpu.use_pallas = os.environ.get("JODO_BENCH_PALLAS", "1") == "1"

    model = create_model(cfg)
    schedule = NoiseSchedule.create(cfg.sde.schedule)
    nodes_dist = get_node_dist(QM9_WITH_H, seed=0)

    b0 = 2
    nm = jnp.ones((b0, pad_n))
    em = jnp.ones((b0, pad_n, pad_n))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.full((b0,), 0.5),
        jnp.zeros((b0, pad_n, 9)), nm, em,
        jnp.zeros((b0, pad_n, pad_n, 2)), jnp.zeros((b0,)),
    )

    round_fn = make_round_fn(cfg, schedule, model, pad_n)
    results = []
    for batch in batches:
        n_nodes = jnp.asarray(nodes_dist.sample(batch))
        t_c0 = time.perf_counter()
        out = round_fn(params, jax.random.PRNGKey(1), n_nodes)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        out = round_fn(params, jax.random.PRNGKey(2), n_nodes)
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - t0
        ms_step = elapsed / steps * 1e3
        rec = {
            "batch": batch,
            "ms_per_step": round(ms_step, 3),
            "mols_per_sec@1000": round(batch / (ms_step * 1.0), 3),
            "mols_per_sec@50": round(batch / (ms_step * 0.05), 3),
            "compile_s": round(compile_s, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    best = max(results, key=lambda r: r["mols_per_sec@1000"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
