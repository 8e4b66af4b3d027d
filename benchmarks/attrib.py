"""Component-level time attribution for the QM9 forward at batch 128.

Times each hot component standalone in a lax.scan (amortised over axon
tunnel dispatch), to locate where the 11 ms/step goes.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, EH, HEADS, EXTRA, L = 128, 32, 256, 64, 16, 2, 8
STEPS = 100
DT = jnp.bfloat16


def timed(name, fn, *args):
    def body(c, _):
        out = fn(*args, c)
        return c + out.astype(jnp.float32).mean() * 0.0, None

    scan = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None, length=STEPS)[0])
    r = scan()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = scan()
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:34s} {ms:8.3f} ms  x{L}={ms*L:7.2f}")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (B, N, D), DT)
    e = jax.random.normal(key, (B, N, N, EH), DT)
    pos = jax.random.normal(key, (B, N, 3), jnp.float32)
    em = jnp.ones((B, N, N), jnp.float32)
    extra = jnp.ones((B, N, N, EXTRA), DT)

    sub_heads = HEADS - EXTRA
    out_ch = D // HEADS
    sub_ch = (HEADS * out_ch) // sub_heads
    w0 = jax.random.normal(key, (EH, sub_heads * sub_ch), DT) * 0.05
    w1 = jax.random.normal(key, (EH, HEADS * out_ch), DT) * 0.05
    q = jax.random.normal(key, (B, N, sub_heads * sub_ch), DT)
    v = jax.random.normal(key, (B, N, HEADS * out_ch), DT)

    from jodo_tpu.ops.pallas_attn import fused_edge_attention

    attn = functools.partial(
        fused_edge_attention,
        sub_heads=sub_heads, sub_ch=sub_ch, heads=HEADS, out_ch=out_ch,
        extra_heads=EXTRA, softmax_inf=True, interpret=False,
    )
    timed("pallas fused attention", lambda c: attn(
        q + c.astype(DT), q, v, e, extra, em, w0, w1), )

    # XLA attention equivalent (jnp path maths)
    import math as _m

    def xla_attn(c):
        qq = (q + c.astype(DT)).reshape(B, N, sub_heads, sub_ch)
        kk = q.reshape(B, N, sub_heads, sub_ch)
        vv = v.reshape(B, N, HEADS, out_ch)
        ea = jnp.tanh(e @ w0).reshape(B, N, N, sub_heads, sub_ch)
        ev = jnp.tanh(e @ w1).reshape(B, N, N, HEADS, out_ch)
        logits = jnp.einsum("bihc,bjhc,bijhc->bhij", qq, kk, ea,
                            preferred_element_type=jnp.float32) / _m.sqrt(out_ch)
        ex = jnp.moveaxis(extra.astype(jnp.float32), -1, 1)
        ex = jnp.where(ex == 0.0, -1e10, ex)
        logits = jnp.concatenate([ex, logits], axis=1)
        mask = em[:, None]
        logits = jnp.where(mask > 0, logits, -1e30)
        logits -= jax.lax.stop_gradient(logits.max(-1, keepdims=True))
        un = jnp.exp(logits) * mask
        alpha = un / jnp.maximum(un.sum(-1, keepdims=True), 1e-20)
        out = jnp.einsum("bhij,bjhc,bijhc->bihc", alpha.astype(DT), vv, ev,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, N, HEADS * out_ch)

    timed("XLA attention", xla_attn)

    # equivariant update pair MLP (the w_c0 heavy path)
    w_e = jax.random.normal(key, (EH, D), DT) * 0.05
    w_d = jax.random.normal(key, (EH, D), DT) * 0.05
    w_c0 = jax.random.normal(key, (D, D), DT) * 0.05
    w_c1 = jax.random.normal(key, (D, 1 + EXTRA), DT) * 0.05
    dist = jax.random.normal(key, (B, N, N, EH), DT)

    def equi(c):
        y_i = h + c.astype(DT)
        inp = y_i[:, :, None, :] + h[:, None, :, :] + e @ w_e + dist @ w_d
        xf = inp.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        inv = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(DT)
        inv = inv @ w_c0
        inv = jax.nn.silu(inv)
        inv = inv @ w_c1
        inv = jnp.tanh(inv).astype(jnp.float32)
        adjs = jnp.concatenate([jnp.ones_like(inv[..., :1]),
                                extra.astype(jnp.float32)], -1)
        inv = jnp.mean(inv * adjs, axis=-1, keepdims=True)
        cd = pos[:, :, None, :] - pos[:, None, :, :]
        nsq = jnp.sum(cd * cd, -1, keepdims=True)
        cd = cd / jnp.sqrt(jnp.maximum(nsq, 1e-16)) * 0.01
        return pos + jnp.sum(cd * inv * em[..., None], axis=2)

    timed("equi coord update (XLA)", equi)

    # edge FFN 64->128->64
    wf1 = jax.random.normal(key, (EH, 2 * EH), DT) * 0.05
    wf2 = jax.random.normal(key, (2 * EH, EH), DT) * 0.05

    def ffe(c):
        y = (e + c.astype(DT)) @ wf1
        return jax.nn.silu(y) @ wf2

    timed("edge FFN", ffe)

    # GBF + block edge_emb
    w_emb = jax.random.normal(key, (2 * EH, EH), DT) * 0.05
    means = jax.random.uniform(key, (EH - 1,))
    stds = jax.random.uniform(key, (EH - 1,)) + 0.5

    def gbf_emb(c):
        pp = pos + c
        sq = jnp.sum((pp[:, :, None] - pp[:, None]) ** 2, -1, keepdims=True)
        g = jnp.exp(-0.5 * (((sq - means) / stds) ** 2)) / (2.5 * stds)
        df = jnp.concatenate([sq, g], -1).astype(DT)
        return jnp.concatenate([df, e], -1) @ w_emb

    timed("GBF + block edge_emb", gbf_emb)

    # node-side matmuls (q,k,v,node2edge,ff,skip,equi i/j)
    wn = jax.random.normal(key, (D, D), DT) * 0.05

    def nodes(c):
        y = h + c.astype(DT)
        acc = 0
        for _ in range(7):
            y2 = y @ wn
            acc = acc + y2
        return acc

    timed("7 node matmuls DxD", nodes)


if __name__ == "__main__":
    main()
