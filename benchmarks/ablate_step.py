"""Ablation timing of the DGT sampling step: turn off one component at a
time and measure the scan-amortised per-step cost to locate where the
remaining non-attention milliseconds live (r3 perf work).

Usage: python benchmarks/ablate_step.py [pad_n] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model


def time_scan_forward(model, params, batch, pad_n, feat, edge_ch, iters=60):
    """One jitted scan of `iters` chained forwards (sampling-shaped)."""

    def body(carry, _):
        xh, e = carry
        noise = jnp.full((batch,), 0.5)
        t = jnp.full((batch,), 0.5)
        pred, e_pred = model.apply(
            params, t, xh, nm, em, e, noise, deterministic=True
        )
        # keep a sequential dependency even when pred shapes differ (2D
        # variant drops the position channels)
        xh = xh * (1.0 + 0.0 * jnp.mean(pred))
        e = e * (1.0 + 0.0 * jnp.mean(e_pred))
        return (xh, e), ()

    nm = jnp.ones((batch, pad_n))
    em = jnp.ones((batch, pad_n, pad_n)) - jnp.eye(pad_n)[None]
    xh0 = jnp.zeros((batch, pad_n, feat))
    e0 = jnp.zeros((batch, pad_n, pad_n, edge_ch))

    @jax.jit
    def run(xh, e):
        (xh, e), _ = jax.lax.scan(body, (xh, e), None, length=iters)
        return xh, e

    out = run(xh0, e0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(xh0, e0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    pad_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    feat, edge_ch = 9, 2

    base = get_config("qm9_uncond_jodo")
    base.model.dropout = 0.0
    base.tpu.compute_dtype = "bfloat16"
    base.tpu.use_pallas = True

    variants = {
        "full": {},
        "no_pallas(XLA attn)": {"tpu.use_pallas": False},
        "no_equivariant(2D path)": {"model.name": "DGT_concat_2D"},
        "no_dist_gbf": {"model.dist_gbf": False},
        "no_extra_heads": {"model.n_extra_heads": 0},
        "no_cond_time": {"model.cond_time": False},
        "mlp_ratio_1": {"model.mlp_ratio": 1},
        "half_layers": {"model.n_layers": 4},
    }

    results = {}
    for name, overrides in variants.items():
        cfg = get_config("qm9_uncond_jodo")
        cfg.model.dropout = 0.0
        cfg.tpu.compute_dtype = "bfloat16"
        cfg.tpu.use_pallas = True
        for k, v in overrides.items():
            node = cfg
            parts = k.split(".")
            for p in parts[:-1]:
                node = getattr(node, p)
            setattr(node, parts[-1], v)
        model = create_model(cfg)
        b0 = 2
        nm = jnp.ones((b0, pad_n))
        em = jnp.ones((b0, pad_n, pad_n))
        f = feat
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.full((b0,), 0.5),
            jnp.zeros((b0, pad_n, f)), nm, em,
            jnp.zeros((b0, pad_n, pad_n, edge_ch)), jnp.zeros((b0,)),
        )
        ms = time_scan_forward(model, params, batch, pad_n, f, edge_ch)
        results[name] = ms
        delta = results["full"] - ms if name != "full" else 0.0
        print(f"{name:28s} {ms:7.3f} ms/step   (saves {delta:+.3f})",
              flush=True)

    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
