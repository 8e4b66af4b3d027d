"""A/B the sampling-step cost across pallas configurations at the
production bucket shapes (value-fetch synchronised; see BASELINE.md r3
measurement-artifact note).

Usage: python benchmarks/step_ab.py [iters]
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


def time_scan_forward(cfg, batch, pad_n, feat, edge_ch, iters=100):
    model = create_model(cfg)
    nm = jnp.ones((batch, pad_n))
    em = jnp.ones((batch, pad_n, pad_n)) - jnp.eye(pad_n)[None]
    xh0 = jnp.zeros((batch, pad_n, feat))
    e0 = jnp.zeros((batch, pad_n, pad_n, edge_ch))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.full((2,), 0.5), xh0[:2], nm[:2], em[:2], e0[:2],
        jnp.full((2,), 0.5), deterministic=True,
    )

    def body(carry, _):
        xh, e = carry
        noise = jnp.full((batch,), 0.5)
        t = jnp.full((batch,), 0.5)
        pred, e_pred = model.apply(
            params, t, xh, nm, em, e, noise, deterministic=True
        )
        xh = xh * (1.0 + 0.0 * jnp.mean(pred))
        e = e * (1.0 + 0.0 * jnp.mean(e_pred))
        return (xh, e), ()

    @jax.jit
    def run(xh, e):
        (xh, e), _ = jax.lax.scan(body, (xh, e), None, length=iters)
        return jnp.sum(xh) + jnp.sum(e)

    float(run(xh0, e0))  # compile + warm
    t0 = time.perf_counter()
    float(run(xh0, e0))  # value fetch = real sync
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg_name = os.environ.get("JODO_AB_CONFIG", "qm9_uncond_jodo")
    probe = get_config(cfg_name)
    feat = 3 + int(probe.data.atom_types) + int(probe.model.include_fc_charge)
    edge_ch = int(probe.model.edge_ch)

    shapes = [(16, 256), (24, 256), (32, 128)]
    if os.environ.get("JODO_AB_SHAPES"):
        shapes = [tuple(int(x) for x in s.split("x"))
                  for s in os.environ["JODO_AB_SHAPES"].split(",")]
    variants = {
        "xla": dict(use_pallas=False, use_pallas_block=False),
        "attn": dict(use_pallas=True, use_pallas_block=False),
        "block": dict(use_pallas=True, use_pallas_block=True),
        "echain": dict(use_pallas=True, use_pallas_block=False,
                       use_pallas_edge_chain=True),
    }
    if os.environ.get("JODO_AB_VARIANTS"):
        keep = os.environ["JODO_AB_VARIANTS"].split(",")
        variants = {k: v for k, v in variants.items() if k in keep}
    for pad_n, batch in shapes:
        row = {}
        for name, flags in variants.items():
            cfg = get_config(cfg_name)
            cfg.model.dropout = 0.0
            cfg.tpu.compute_dtype = "bfloat16"
            for k, v in flags.items():
                setattr(cfg.tpu, k, v)
            ms = time_scan_forward(cfg, batch, pad_n, feat, edge_ch, iters)
            row[name] = ms
        per_mol = {k: v / batch for k, v in row.items()}
        print(
            f"pad={pad_n} batch={batch}: "
            + "  ".join(f"{k}={v:.2f}ms ({per_mol[k]*1e3:.1f}us/mol)"
                        for k, v in row.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
