"""Standalone A/B: fused_equi_update kernel vs the XLA equi chain."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N, H, EH, X = 128, 32, 256, 64, 2
DT = jnp.bfloat16


def timed(name, fn):
    scan = jax.jit(
        lambda: jax.lax.scan(
            lambda c, _: (c + fn(c).mean() * 0.0, None), jnp.float32(0.0),
            None, length=100,
        )[0]
    )
    r = scan(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = scan(); jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 100 * 1e3
    print(f"{name:28s} {ms:7.3f} ms/call  x8={ms*8:6.2f}")


def main():
    k = jax.random.PRNGKey(0)
    y_i = jax.random.normal(k, (B, N, H), DT)
    y_j = jax.random.normal(k, (B, N, H), DT)
    e = jax.random.normal(k, (B, N, N, EH), DT)
    d = jax.random.normal(k, (B, N, N, EH), DT)
    extra = jnp.ones((B, N, N, X), DT)
    shift = jax.random.normal(k, (B, H), DT)
    scale = jax.random.normal(k, (B, H), DT)
    w_e = jax.random.normal(k, (EH, H), DT) * 0.05
    w_d = jax.random.normal(k, (EH, H), DT) * 0.05
    w_c0 = jax.random.normal(k, (H, H), DT) * 0.05
    b_c0 = jnp.zeros((H,), jnp.float32)
    w_c1 = jax.random.normal(k, (H, 1 + X), DT) * 0.05

    from jodo_tpu.ops.pallas_equi import fused_equi_update

    timed("pallas fused_equi_update", lambda c: fused_equi_update(
        y_i + c.astype(DT), y_j, e, d, extra, shift, scale,
        w_e, w_d, w_c0, b_c0, w_c1, extra_heads=X))

    def xla(c):
        inp = (y_i + c.astype(DT))[:, :, None, :] + y_j[:, None, :, :] + e @ w_e + d @ w_d
        xf = inp.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        u = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(DT)
        u = u * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        h = u @ w_c0 + b_c0.astype(DT)
        h = jax.nn.silu(h)
        z = jnp.tanh(h @ w_c1).astype(jnp.float32)
        adjs = jnp.concatenate(
            [jnp.ones_like(z[..., :1]), extra.astype(jnp.float32)], -1)
        return jnp.mean(z * adjs, axis=-1)

    timed("XLA equi chain", xla)


if __name__ == "__main__":
    main()
