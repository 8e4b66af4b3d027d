"""In-chain timing: fused edge-chain Pallas kernel vs the XLA equivalent.

Mimics the sampling regime (scan of chained calls, bf16 streams) at the
dominant QM9 bucket (pad 24, batch 256) and at pad 32 / batch 128.
Run on the real TPU:  python benchmarks/kern_edge_chain.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jodo_tpu.ops.pallas_edge_chain import fused_edge_chain


def make_args(rng, b, n, e_dim, hd, extra_heads, dt):
    f = lambda *s, sc=0.2: jnp.asarray(rng.normal(0, sc, s), dt)  # noqa: E731
    n_gate = 1 + extra_heads
    return dict(
        y=f(b, n, e_dim), z=f(b, n, 2 * hd), e_in=f(b, n, n, e_dim),
        d=f(b, n, n, e_dim),
        extra=jnp.asarray(rng.integers(0, 2, (b, n, n, max(extra_heads, 1))), dt),
        mask=jnp.ones((b, n, n), jnp.float32),
        r=jnp.abs(jnp.asarray(rng.normal(0, 1, (b, n, n)), jnp.float32)) + 0.5,
        eg_msa=f(b, e_dim), es_mlp=f(b, e_dim), esc_mlp=f(b, e_dim),
        eg_mlp=f(b, e_dim), sh=f(b, hd), sc=f(b, hd),
        n2e_b=f(e_dim), ff1_w=f(e_dim, 2 * e_dim), ff1_b=f(2 * e_dim),
        ff2_w=f(2 * e_dim, e_dim), ff2_b=f(e_dim),
        w_e=f(e_dim, hd), w_d=f(e_dim, hd), w_c0=f(hd, hd), b_c0=f(hd),
        w_c1=f(hd, n_gate), cn_scale=jnp.full((1,), 1e-2, jnp.float32),
        n_gate=n_gate,
    )


def xla_chain(a):
    def ln(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)

    def mod(x, shift, scale):
        return x * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]

    y = a["y"]
    h_edge = y[:, :, None, :] + y[:, None, :, :] + a["n2e_b"]
    e1 = a["e_in"] + a["eg_msa"][:, None, None, :] * h_edge
    e1n = mod(ln(e1), a["es_mlp"], a["esc_mlp"])
    mid = jax.nn.silu(e1n @ a["ff1_w"] + a["ff1_b"])
    ff = mid @ a["ff2_w"] + a["ff2_b"]
    e_out = e1n + a["eg_mlp"][:, None, None, :] * ff

    hd = a["w_c0"].shape[0]
    z_i, z_j = a["z"][..., :hd], a["z"][..., hd:]
    t = z_i[:, :, None, :] + z_j[:, None, :, :] + e_out @ a["w_e"] \
        + a["d"] @ a["w_d"]
    t = mod(ln(t), a["sh"], a["sc"])
    g = jax.nn.silu(t @ a["w_c0"] + a["b_c0"])
    inv = jnp.tanh(g @ a["w_c1"]).astype(jnp.float32)
    ones = jnp.ones_like(inv[..., :1])
    adjs = jnp.concatenate([ones, a["extra"].astype(jnp.float32)], -1) \
        if a["n_gate"] > 1 else ones
    inv = jnp.sum(inv * adjs, -1) / a["n_gate"]
    w = inv * a["mask"] * (a["cn_scale"][0] / a["r"])
    return e_out, w


def run_chain(fn, a, iters=40):
    def body(carry, _):
        e, d = carry
        a2 = dict(a, e_in=e, d=d)
        e_out, w = fn(a2)
        d2 = d * (1.0 + 0.0 * jnp.mean(w).astype(d.dtype))
        return (e_out.astype(e.dtype), d2), ()

    @jax.jit
    def run(e, d):
        (e, d), _ = jax.lax.scan(body, (e, d), None, length=iters)
        return e, d

    out = run(a["e_in"], a["d"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(a["e_in"], a["d"])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    for (b, n) in [(256, 24), (128, 32)]:
        a = make_args(rng, b, n, e_dim=64, hd=256, extra_heads=2,
                      dt=jnp.bfloat16)

        def pallas_fn(a2):
            return fused_edge_chain(
                a2["y"], a2["z"], a2["e_in"], a2["d"], a2["extra"],
                a2["mask"], a2["r"], a2["eg_msa"], a2["es_mlp"],
                a2["esc_mlp"], a2["eg_mlp"], a2["sh"], a2["sc"],
                a2["n2e_b"], a2["ff1_w"], a2["ff1_b"], a2["ff2_w"],
                a2["ff2_b"], a2["w_e"], a2["w_d"], a2["w_c0"], a2["b_c0"],
                a2["w_c1"], a2["cn_scale"], n_gate_heads=a2["n_gate"],
                tile_i=24, interpret=jax.default_backend() != "tpu",
            )

        # correctness spot check on-device
        ek, wk = pallas_fn(a)
        er, wr = xla_chain(a)
        err = float(jnp.max(jnp.abs(wk - wr)))
        ms_x = run_chain(xla_chain, a)
        ms_p = run_chain(pallas_fn, a)
        print(f"B={b} N={n}: XLA {ms_x:.3f} ms  Pallas {ms_p:.3f} ms "
              f"({ms_x / ms_p:.2f}x)  max|dw|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
