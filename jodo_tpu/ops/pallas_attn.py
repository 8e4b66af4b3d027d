"""Fused edge-biased attention Pallas TPU kernel.

The DGT attention needs, per pair (i,j):
    ea = tanh(W0 e_ij)   (logit gate)      [sub_heads * sub_ch]
    ev = tanh(W1 e_ij)   (value gate)      [heads * out_ch]
    logit[i,j,h] = sum_{c in head h} q[i,c] k[j,c] ea[i,j,c] / sqrt(out_ch)
    out[i,c]     = sum_j softmax_j(logit)[i,j,head(c)] v[j,c] ev[i,j,c]

In the XLA formulation the two N^2-sized gate tensors ea/ev are
materialised to HBM every layer (~hundreds of MB per forward). This kernel
computes them tile-by-tile in VMEM: for each (batch, i-tile) grid cell it
loads the edge tile once, runs both gate matmuls on the MXU, and finishes
logits + masked softmax + the value reduction in-register — edge features
are read from HBM exactly once and the gates never leave VMEM.

Mosaic layout constraints shape the formulation: channels stay packed in
the lane (last) dimension end-to-end; per-head reductions/expansions are
expressed as matmuls with 0/1 head-selection matrices (MXU) and the
softmax reduces over the sublane neighbour axis — no lane-dim reshapes.

Numerics match the jnp reference path (f32 accumulation); `interpret=True`
is used automatically off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_MASK = -1e30
NEG_EXTRA = -1e10

__all__ = ["fused_edge_attention"]


def _head_matrix(n_channels: int, n_heads: int, ch_per_head: int, dtype):
    """S[c, h] = 1 where channel c belongs to head h (0/1 matrix)."""
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (n_channels, n_heads), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (n_channels, n_heads), 1)
    return (c_ids // ch_per_head == h_ids).astype(dtype)


def _attn_kernel(
    q_ref, k_ref, v_ref, e_ref, extra_ref, mask_ref, w0_ref, w1_ref, out_ref,
    *, sub_heads, sub_ch, heads, out_ch, extra_heads, softmax_inf, scale,
):
    # block shapes (leading singleton = batch block):
    #   q    [1, TI, SH*SC]   k [1, N, SH*SC]   v [1, N, H*C]
    #   e    [1, TI, N, E]    extra [1, TI, N, XH]   mask [1, TI, N]
    #   out  [1, TI, H*C]
    ti = q_ref.shape[1]
    n = k_ref.shape[1]
    e_dim = e_ref.shape[-1]
    f32 = jnp.float32

    e_flat = e_ref[0].reshape(ti * n, e_dim)
    ea = jnp.tanh(jnp.dot(e_flat, w0_ref[:], preferred_element_type=f32))
    ev = jnp.tanh(jnp.dot(e_flat, w1_ref[:], preferred_element_type=f32))
    ea = ea.reshape(ti, n, sub_heads * sub_ch)  # sublane split only
    ev = ev.reshape(ti, n, heads * out_ch)

    q = q_ref[0].astype(f32)  # [TI, SH*SC]
    k = k_ref[0].astype(f32)  # [N, SH*SC]
    v = v_ref[0].astype(f32)  # [N, H*C]

    # per-channel products then per-head sums via the selection matmul
    p = q[:, None, :] * k[None, :, :] * ea  # [TI, N, SH*SC]
    s_sub = _head_matrix(sub_heads * sub_ch, sub_heads, sub_ch, f32)
    logits_sub = (
        jax.lax.dot_general(
            p, s_sub, (((2,), (0,)), ((), ())), preferred_element_type=f32
        )
        * scale
    )  # [TI, N, SH]

    if extra_heads > 0:
        extra = extra_ref[0].astype(f32)  # [TI, N, XH]
        if softmax_inf:
            extra = jnp.where(extra == 0.0, NEG_EXTRA, extra)
        # place extra heads first, q/k heads after, via selection matmuls
        # (lane-dim concat is not Mosaic-friendly)
        ex_sel = _head_matrix(extra_heads, extra_heads, 1, f32)  # eye XH
        ex_pad = jnp.pad(ex_sel, ((0, 0), (0, sub_heads)))  # [XH, H]
        sub_pad = jnp.pad(
            jnp.eye(sub_heads, dtype=f32), ((0, 0), (extra_heads, 0))
        )  # [SH, H]
        logits = (
            jax.lax.dot_general(
                extra, ex_pad, (((2,), (0,)), ((), ())), preferred_element_type=f32
            )
            + jax.lax.dot_general(
                logits_sub, sub_pad, (((2,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        )  # [TI, N, H]
    else:
        logits = logits_sub  # [TI, N, H]

    mask = mask_ref[0][:, :, None]  # [TI, N, 1]
    logits = jnp.where(mask > 0, logits, NEG_MASK)
    # softmax over the neighbour (sublane) axis
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    unnorm = jnp.exp(logits) * mask
    denom = jnp.maximum(jnp.sum(unnorm, axis=1, keepdims=True), 1e-20)
    alpha = unnorm / denom  # [TI, N, H]

    # expand per-head alpha to channels, weight values, reduce neighbours
    e_full = _head_matrix(heads * out_ch, heads, out_ch, f32).T  # [H, H*C]
    alpha_chan = jax.lax.dot_general(
        alpha, e_full, (((2,), (0,)), ((), ())), preferred_element_type=f32
    )  # [TI, N, H*C]
    out = jnp.sum(alpha_chan * v[None, :, :] * ev, axis=1)  # [TI, H*C]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sub_heads", "sub_ch", "heads", "out_ch", "extra_heads",
        "softmax_inf", "tile_i", "interpret",
    ),
)
def fused_edge_attention(
    q, k, v, edge_attr, extra_adj, edge_mask, w0, w1,
    *, sub_heads, sub_ch, heads, out_ch, extra_heads=0, softmax_inf=True,
    tile_i=16, interpret=False,
):
    """q [B,N,SH*SC], k [B,N,SH*SC], v [B,N,H*C], edge_attr [B,N,N,E],
    extra_adj [B,N,N,XH] or None, edge_mask [B,N,N], w0 [E,SH*SC],
    w1 [E,H*C] -> out [B,N,H*C]."""
    b, n = q.shape[0], q.shape[1]
    # adaptive i-tile: the kernel's VMEM working set is dominated by
    # ~[tile_i, n, C_total] f32 buffers (ea/ev/qk/alpha_chan, C_total ~ 1k
    # channels); keep it within a few MB of the 16MB VMEM
    # ~1280 f32 channels across the live per-row buffers => n*5120 bytes/row;
    # Mosaic additionally requires the sublane (i-tile) dim to be a multiple
    # of 8 (or the full axis)
    import os
    budget_rows = max(8, (int(os.environ.get('JODO_ATTN_VMEM_MB', '4')) * 1024 * 1024) // (n * 5120))
    best = None
    for cand in range(8, n + 1, 8):
        if n % cand == 0 and cand <= min(tile_i, budget_rows):
            best = cand
    if best is None:
        best = n if n <= budget_rows or n % 8 != 0 else 8
    tile_i = best
    num_tiles = n // tile_i if n % tile_i == 0 else 1
    if n % tile_i != 0:
        tile_i = n
        num_tiles = 1

    if extra_adj is None:
        extra_adj = jnp.zeros((b, n, n, 1), q.dtype)

    kernel = functools.partial(
        _attn_kernel,
        sub_heads=sub_heads, sub_ch=sub_ch, heads=heads, out_ch=out_ch,
        extra_heads=extra_heads, softmax_inf=softmax_inf,
        scale=1.0 / math.sqrt(out_ch),
    )

    grid = (b, num_tiles)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_i, q.shape[-1]), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((1, n, k.shape[-1]), lambda bi, it: (bi, 0, 0)),
            pl.BlockSpec((1, n, v.shape[-1]), lambda bi, it: (bi, 0, 0)),
            pl.BlockSpec(
                (1, tile_i, n, edge_attr.shape[-1]), lambda bi, it: (bi, it, 0, 0)
            ),
            pl.BlockSpec(
                (1, tile_i, n, extra_adj.shape[-1]), lambda bi, it: (bi, it, 0, 0)
            ),
            pl.BlockSpec((1, tile_i, n), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((w0.shape[0], w0.shape[1]), lambda bi, it: (0, 0)),
            pl.BlockSpec((w1.shape[0], w1.shape[1]), lambda bi, it: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_i, heads * out_ch), lambda bi, it: (bi, it, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, heads * out_ch), q.dtype),
        interpret=interpret,
    )(
        q, k, v, edge_attr, extra_adj, edge_mask, w0, w1
    )
