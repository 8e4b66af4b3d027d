"""Headline benchmark: QM9-shaped molecule sampling throughput (mols/sec).

Runs the flagship DGT (QM9 config: nf=256, 8 layers, 16 heads) through the
scan-compiled 1000-step ancestral sampler on whatever accelerator JAX
exposes, then prints ONE JSON line:
  {"metric": "qm9_sampling_mols_per_sec", "value": ..., "unit": "mols/sec",
   "vs_baseline": ...}

The baseline divisor is the PyTorch reference's A100 throughput for the
same protocol (batch 2500, 1000 steps). The repo publishes no wall-clock
numbers (BASELINE.md), so the anchor below is the measured per-forward cost
of the reference model extrapolated to the full chain; conditions recorded
in BASELINE.md. Override with env JODO_BASELINE_MOLS_PER_SEC.

Env knobs: JODO_BENCH_BATCH (default 512), JODO_BENCH_STEPS (default 1000),
JODO_BENCH_DTYPE (float32|bfloat16).
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jodo_tpu.configs import get_config
    from jodo_tpu.diffusion import NoiseSchedule
    from jodo_tpu.models import create_model, get_node_dist
    from jodo_tpu.data.datasets_info import QM9_WITH_H
    from jodo_tpu.sampling import make_round_fn

    batch = int(os.environ.get("JODO_BENCH_BATCH", "128"))
    steps = int(os.environ.get("JODO_BENCH_STEPS", "1000"))

    cfg = get_config("qm9_uncond_jodo")
    cfg.sampling.steps = steps
    cfg.model.dropout = 0.0
    cfg.tpu.compute_dtype = os.environ.get("JODO_BENCH_DTYPE", "bfloat16")
    cfg.tpu.use_pallas = os.environ.get("JODO_BENCH_PALLAS", "1") == "1"
    pad_n = 32

    model = create_model(cfg)
    schedule = NoiseSchedule.create(cfg.sde.schedule)
    nodes_dist = get_node_dist(QM9_WITH_H, seed=0)

    # init params at the real model scale
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
    n_nodes = jnp.asarray(nodes_dist.sample(batch))
    key = jax.random.PRNGKey(1)

    # compile + warmup
    out = round_fn(params, key, n_nodes)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = round_fn(params, jax.random.PRNGKey(2), n_nodes)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    mols_per_sec = batch / elapsed

    # Baseline: PyTorch JODO on A100, batch 2500, 1000 ancestral steps.
    # See BASELINE.md "Measured results" for how this anchor was obtained.
    baseline = float(os.environ.get("JODO_BASELINE_MOLS_PER_SEC", "10.0"))

    print(json.dumps({
        "metric": "qm9_sampling_mols_per_sec",
        "value": round(mols_per_sec, 3),
        "unit": "mols/sec",
        "vs_baseline": round(mols_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
