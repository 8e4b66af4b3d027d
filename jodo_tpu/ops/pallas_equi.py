"""Fused equivariant coordinate-gate Pallas TPU kernel (v2).

The DGT position update (models/dgt.py EquivariantCoordUpdate; reference
MultiCondEquiUpdate, mol_gnn.py:51-94) evaluates, per pair (i,j):

    u    = LN(y_i + y_j + W_e e_ij + W_d d_ij) * (1+scale) + shift
    z    = tanh( silu(u @ Wc0 + bc0) @ Wc1 )          [1 + extra heads]
    inv  = mean(z * [1, extra_adj_ij])                scalar

The XLA path materialises four [B,N,N,hidden] intermediates per block to
HBM (profile r2: ~0.55 ms/layer at B=128,N=32 — pair construct, two 64->256
convs, LayerNorm stats, and a 3-lane matmul tail). This kernel keeps the
whole hidden-width pair chain in VMEM per (batch, i-tile) grid cell and
writes only the scalar pair gate inv [B,N,N].

v2 changes vs the round-1 version (which measured *slower* than XLA,
BASELINE.md r1):
  * the elementwise chain runs in bf16 (matching XLA's stream dtype);
    only LayerNorm statistics and the final tanh/mean are f32 — the r1
    kernel ran every VPU op in f32, doubling vector work
  * Wc1 is one [hidden, pad8(1+extra)] matmul instead of two lane-1/2
    matmuls; the adjacency-weighted head mean happens on the [TI*N, 8]
    result in-register
  * full-row i-tiles (fewer grid cells, weight DMAs hoisted)

The [B,N,N,3]-shaped coordinate weighting itself stays outside: dgt.py
factors it as pos*rowsum(w) - w@pos (one MXU matmul), so no 3-lane pair
tensor exists in either path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_equi_update"]


def _equi_kernel(
    yi_ref, yj_ref, e_ref, d_ref, extra_ref, shift_ref, scale_ref,
    we_ref, wd_ref, wc0_ref, bc0_ref, wc1_ref, out_ref,
    *, extra_heads,
):
    # blocks: yi [BB,N,H], yj [BB,N,H], e [BB,N,N,E], d [BB,N,N,Dd],
    # extra [BB,N,N,X], shift/scale [BB,1,H], bc0 [1,H], wc1 [H,8],
    # out [BB,N,N]. BB batch items per grid cell amortise per-cell
    # overheads (Mosaic grid iteration + DMA latency).
    bb = yi_ref.shape[0]
    n = yj_ref.shape[1]
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    hidden = yi_ref.shape[-1]
    rows = bb * n * n

    e_flat = e_ref[:].reshape(rows, e_ref.shape[-1])
    d_flat = d_ref[:].reshape(rows, d_ref.shape[-1])
    # MXU accumulates f32 (Mosaic requirement); the stream casts to bf16
    # immediately — the result feeds a LayerNorm, bf16-level error is
    # already present in the XLA bf16 path
    ye = jnp.dot(e_flat, we_ref[:], preferred_element_type=f32)
    yd = jnp.dot(d_flat, wd_ref[:], preferred_element_type=f32)
    pair = (
        (ye + yd).astype(bf16).reshape(bb, n, n, hidden)
        + yi_ref[:].astype(bf16)[:, :, None, :]
        + yj_ref[:].astype(bf16)[:, None, :, :]
    ).reshape(rows, hidden)

    # affine-free LayerNorm: lane-mean/var via an MXU ones-matmul (the VPU
    # lane reduction is the hot spot in the XLA formulation), f32 stats
    ones_h = jnp.ones((hidden, 8), bf16)
    mean = jax.lax.dot(pair, ones_h, preferred_element_type=f32)[:, :1] * (
        1.0 / hidden
    )
    sq = (pair * pair).astype(bf16)
    ex2 = jax.lax.dot(sq, ones_h, preferred_element_type=f32)[:, :1] * (
        1.0 / hidden
    )
    inv_std = jax.lax.rsqrt(jnp.maximum(ex2 - mean * mean, 0.0) + 1e-6)
    # u = (pair - mean)*inv_std*(1+scale) + shift, folded bf16 passes;
    # shift/scale are per-graph
    a = inv_std.astype(bf16)  # [rows, 1]
    s1 = (1.0 + scale_ref[:, 0].astype(bf16))[:, None, :]  # [BB,1,H]
    sh = shift_ref[:, 0].astype(bf16)[:, None, :]
    u = ((pair - mean.astype(bf16)) * a).reshape(bb, n * n, hidden)
    u = (u * s1 + sh).reshape(rows, hidden)

    h = jnp.dot(u, wc0_ref[:].astype(bf16), preferred_element_type=f32) + (
        bc0_ref[0].astype(f32)
    )
    h = (h * jax.nn.sigmoid(h)).astype(bf16)  # silu
    z = jnp.tanh(
        jnp.dot(h, wc1_ref[:].astype(bf16), preferred_element_type=f32)
    )  # [rows, 8] — cols 0..extra_heads real, rest zero-weighted
    z = z.reshape(bb, n, n, -1)
    if extra_heads > 0:
        adjs = extra_ref[:].astype(f32)  # [BB, N, N, X]
        inv = (
            z[..., 0] + jnp.sum(z[..., 1 : 1 + extra_heads] * adjs, axis=-1)
        ) / (1.0 + extra_heads)
    else:
        inv = z[..., 0]
    out_ref[:] = inv.astype(out_ref.dtype)  # [BB, N, N]


@functools.partial(
    jax.jit,
    static_argnames=("extra_heads", "tile_i", "interpret"),
)
def fused_equi_update(
    y_i, y_j, edge_feat, dist_feat, extra_adj,
    shift, scale, w_e, w_d, w_c0, b_c0, w_c1,
    *, extra_heads=0, tile_i=32, interpret=False,
):
    """Returns the scalar pair gates inv [B, N, N] (f32).

    y_i/y_j [B,N,H] (node-term projections; y_i carries the bias),
    edge_feat [B,N,N,E], dist_feat [B,N,N,Dd], extra_adj [B,N,N,X] or None,
    shift/scale [B,H] adaLN terms (zeros when uncond), w_e [E,H],
    w_d [Dd,H], w_c0 [H,H], b_c0 [H], w_c1 [H, 1+extra]."""
    b, n, hidden = y_i.shape

    # batch items per grid cell: target ~[4096, hidden] rows per cell to
    # amortise grid-iteration and DMA overheads within the VMEM budget
    import os

    target_rows = int(os.environ.get("JODO_EQUI_ROWS", "4096"))
    bb = max(1, min(b, target_rows // (n * n)))
    while b % bb != 0:
        bb -= 1

    if extra_adj is None:
        extra_adj = jnp.zeros((b, n, n, 1), y_i.dtype)

    shift3 = shift[:, None, :]
    scale3 = scale[:, None, :]
    # pad the head dim of Wc1 to 8 sublanes: one matmul, no lane slicing
    w_c1p = jnp.zeros((hidden, 8), w_c1.dtype).at[:, : w_c1.shape[1]].set(w_c1)
    bc0_2d = b_c0.reshape(1, -1)

    kernel = functools.partial(_equi_kernel, extra_heads=extra_heads)
    out = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, hidden), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bb, n, hidden), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bb, n, n, edge_feat.shape[-1]),
                         lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((bb, n, n, dist_feat.shape[-1]),
                         lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((bb, n, n, extra_adj.shape[-1]),
                         lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((bb, 1, hidden), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((bb, 1, hidden), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((w_e.shape[0], hidden), lambda bi: (0, 0)),
            pl.BlockSpec((w_d.shape[0], hidden), lambda bi: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda bi: (0, 0)),
            pl.BlockSpec((1, hidden), lambda bi: (0, 0)),
            pl.BlockSpec((hidden, 8), lambda bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, n, n), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        interpret=interpret,
    )(
        y_i, y_j, edge_feat, dist_feat, extra_adj,
        shift3, scale3, w_e, w_d, w_c0, bc0_2d, w_c1p,
    )
    return out
