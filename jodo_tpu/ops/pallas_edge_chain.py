"""Fused post-attention edge-chain Pallas TPU kernel (sampling path).

Covers the pair-tensor chain of one DGTBlock after attention
(models/dgt.py DGTBlock.__call__ + EquivariantCoordUpdate):

    h_edge   = y_i + y_j + b                      (node2edge broadcast)
    e1       = e_in + eg_msa * h_edge             (gated residual)
    e1n      = modulate(LN(e1), es_mlp, esc_mlp)
    ff       = Dense2( silu(Dense1(e1n)) )        (edge FFN, ratio 2)
    e_out    = e1n + eg_mlp * ff
    t        = z_i + z_j + e_out @ w_e + d @ w_d  (equi-gate input)
    inv      = tanh( silu(modulate(LN(t), sh, sc) @ w_c0 + b_c0) @ w_c1 )
    w        = mean_heads(inv * [1, extra_adj]) * mask / max(r, eps)

Outputs BOTH e_out [B,N,N,E] (the block's edge stream, one unavoidable
HBM write) and w [B,N,N] (the equivariant update weights; the [B,N,3]
position update itself is two tiny XLA matmuls downstream).

Why fuse: between attention and the position update the XLA path
materialises ~6 pair-tensor intermediates per layer (h_edge, e1, e1n,
FFN-mid at 2x width, ff, t at 4x width); this kernel keeps them all in
VMEM, reading e_in/dist once and writing e_out/w once. All matmuls run on
the MXU in the input dtype with f32 accumulation; LayerNorm statistics are
computed with ones-matmuls over the lane dim (Mosaic-friendly), matching
models.layers.layer_norm numerics (f32, eps 1e-6).

Forward-only (sampling / EMA eval); training keeps the autodiff+remat XLA
path (BASELINE.md r2). `interpret=True` off-TPU for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_mod(x, shift, scale, f32=jnp.float32):
    """Affine-free LN over the lane dim + adaLN modulate, f32 stats."""
    xf = x.astype(f32)
    d = x.shape[-1]
    mean = jnp.sum(xf, axis=-1, keepdims=True) / d
    cen = xf - mean
    var = jnp.sum(cen * cen, axis=-1, keepdims=True) / d
    y = cen * jax.lax.rsqrt(var + 1e-6)
    return y * (1.0 + scale) + shift


@functools.partial(
    jax.jit,
    static_argnames=("n_gate_heads", "tile_i", "interpret"),
)
def fused_edge_chain(
    y, z, e_in, dist_feat, extra_adj, edge_mask, r,
    eg_msa, es_mlp, esc_mlp, eg_mlp, equi_shift, equi_scale,
    n2e_bias, ff1_w, ff1_b, ff2_w, ff2_b,
    w_e, w_d, w_c0, b_c0, w_c1, cn_scale,
    *, n_gate_heads, tile_i=16, interpret=False,
):
    """y [B,N,E] (node2edge projections of h_node, bias separate),
    NOTE: the 64-channel node2edge pair sum y_i+y_j+b is materialised by
    XLA (one [B,N,N,E] tensor, ~20MB at QM9 scale) — Mosaic cannot lower
    sub-128-lane middle-dim broadcasts in-kernel; the wide (>=128 lane)
    z broadcasts stay in-kernel.
    e_in [B,N,N,E], dist_feat [B,N,N,Dd], extra_adj [B,N,N,X] (or ones),
    edge_mask [B,N,N], r [B,N,N] (pair distances, f32),
    per-graph mod vectors [B,C], weights as raw kernels.
    Returns (e_out [B,N,N,E], w [B,N,N]).

    z packs the two equi input projections [B,N,2*HD]:
    z[..., :HD] is the i-role tensor (carries the bias), z[..., HD:] the
    j-role tensor.
    """
    b, n = e_in.shape[0], e_in.shape[1]
    e_dim = e_in.shape[-1]
    hd = w_c0.shape[0]

    # pack i-role and j-role node tensors: kernel slices i-tile from the
    # first half and broadcasts the second half over j
    assert z.shape[-1] == 2 * hd

    if n % tile_i != 0:
        tile_i = n
    num_tiles = n // tile_i

    grid = (b, num_tiles)
    # per-graph mod vectors ride as FULL [B, C] blocks (Mosaic requires the
    # last-two block dims be 8/128-divisible or whole-array; a (1, C) row
    # block is neither) — the kernel slices its batch row via program_id
    vec = lambda a: pl.BlockSpec((1, n, a.shape[-1]), lambda bi, it: (bi, 0, 0))  # noqa: E731
    mat = lambda w_: pl.BlockSpec(w_.shape, lambda bi, it: (0,) * w_.ndim)  # noqa: E731

    out_e = jax.ShapeDtypeStruct((b, n, n, e_dim), e_in.dtype)
    out_w = jax.ShapeDtypeStruct((b, n, n), jnp.float32)

    # per-graph mod vectors are broadcast to [B, N, C] host-side (tiny) so
    # the kernel reads them as ordinary [N, C] blocks — Mosaic rejects both
    # (1, C) row blocks and dynamic-slice + rank-expand of full [B, C]
    bcast = lambda v: jnp.broadcast_to(v[:, None, :], (b, n, v.shape[-1]))  # noqa: E731
    eg_msa, es_mlp, esc_mlp, eg_mlp, equi_shift, equi_scale = (
        bcast(v) for v in
        (eg_msa, es_mlp, esc_mlp, eg_mlp, equi_shift, equi_scale)
    )

    # split z into i/j halves for the kernel (two [B,N,HD] tensors)
    z_i, z_j = z[..., :hd], z[..., hd:]
    h_edge_pre = (y[:, :, None, :] + y[:, None, :, :]
                  + n2e_bias[None, None, None, :]).astype(e_in.dtype)

    def _kernel(hpre_ref, zi_ref, zj_ref, *rest, **kw):
        return _edge_chain_kernel_packed(
            hpre_ref, zi_ref, zj_ref, *rest, n_gate_heads=n_gate_heads)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_i, n, e_dim), lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((1, tile_i, hd), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((1, n, hd), lambda bi, it: (bi, 0, 0)),
            pl.BlockSpec((1, tile_i, n, e_dim), lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((1, tile_i, n, dist_feat.shape[-1]),
                         lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((1, tile_i, n, extra_adj.shape[-1]),
                         lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((1, tile_i, n), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((1, tile_i, n), lambda bi, it: (bi, it, 0)),
            vec(eg_msa), vec(es_mlp), vec(esc_mlp), vec(eg_mlp),
            vec(equi_shift), vec(equi_scale),
            mat(n2e_bias), mat(ff1_w), mat(ff1_b), mat(ff2_w), mat(ff2_b),
            mat(w_e), mat(w_d), mat(w_c0), mat(b_c0), mat(w_c1),
            mat(cn_scale),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_i, n, e_dim), lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((1, tile_i, n), lambda bi, it: (bi, it, 0)),
        ],
        out_shape=[out_e, out_w],
        interpret=interpret,
    )(
        h_edge_pre, z_i, z_j, e_in, dist_feat, extra_adj, edge_mask, r,
        eg_msa, es_mlp, esc_mlp, eg_mlp, equi_shift, equi_scale,
        n2e_bias, ff1_w, ff1_b, ff2_w, ff2_b,
        w_e, w_d, w_c0, b_c0, w_c1, cn_scale,
    )


def _edge_chain_kernel_packed(
    hpre_ref, zi_ref, zj_ref, e_in_ref, d_ref, extra_ref, mask_ref,
    r_ref,
    eg_msa_ref, es_mlp_ref, esc_mlp_ref, eg_mlp_ref, sh_ref, sc_ref,
    n2e_b_ref, ff1_w_ref, ff1_b_ref, ff2_w_ref, ff2_b_ref,
    w_e_ref, w_d_ref, w_c0_ref, b_c0_ref, w_c1_ref, cn_scale_ref,
    e_out_ref, w_out_ref,
    *, n_gate_heads,
):
    # Mosaic layout rules (matching pallas_attn.py): pair tensors stay
    # [TI, N, C] 3-D; matmuls are dot_general over the lane dim; every
    # broadcast is expressed as a BOTH-operand-broadcast multiply against
    # a ones tensor (single-operand leading/sublane broadcast_in_dim in
    # adds is an unsupported shape cast).
    ti = e_in_ref.shape[1]
    n = e_in_ref.shape[2]
    f32 = jnp.float32
    dt = e_in_ref.dtype

    # every 2-D -> 3-D broadcast is a multiply with operand shapes
    # [TI, 1, C] x [1, N, C] (or mirrored) — the exact pattern
    # pallas_attn.py lowers successfully; other broadcast shapes hit
    # Mosaic's "unsupported shape cast".
    def ones_1nc(c):
        return jnp.ones((1, n, c), f32)

    def ones_t1c(c):
        return jnp.ones((ti, 1, c), f32)

    def i_role(v2d):  # [TI, C] -> [TI, N, C]
        return v2d[:, None, :].astype(f32) * ones_1nc(v2d.shape[-1])

    def j_role(v2d):  # [N, C] -> [TI, N, C]
        return v2d[None, :, :].astype(f32) * ones_t1c(v2d.shape[-1])

    def row(ref):  # per-graph vector block [N, C] -> [TI, N, C]
        return j_role(ref[0])

    def vec1(ref):  # weight bias [C] -> [TI, N, C]
        c = ref.shape[0]
        v2 = ref[:][None, :].astype(f32) * jnp.ones((ti, 1), f32)  # [TI, C]
        return i_role(v2)

    def mm(x, w):  # [TI, N, Cin] @ [Cin, Cout] -> [TI, N, Cout] f32
        return jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())), preferred_element_type=f32)

    e_in = e_in_ref[0]                             # [TI, N, E]
    d = d_ref[0]                                   # [TI, N, Dd]
    h_edge = hpre_ref[0].astype(f32)               # [TI, N, E] (y_i+y_j+b)

    g_msa = row(eg_msa_ref)
    e1 = e_in.astype(f32) + g_msa * h_edge
    e1n = _ln_mod(e1, row(es_mlp_ref), row(esc_mlp_ref)).astype(dt)

    mid = mm(e1n, ff1_w_ref[:]) + vec1(ff1_b_ref)
    mid = jax.nn.silu(mid).astype(dt)
    ff = mm(mid, ff2_w_ref[:]) + vec1(ff2_b_ref)
    e_out = e1n.astype(f32) + row(eg_mlp_ref) * ff
    e_out_ref[0] = e_out.astype(e_out_ref.dtype)

    z_i = zi_ref[0]                                # [TI, HD] (tile-mapped)
    z_j = zj_ref[0]                                # [N, HD]
    t = mm(e_out.astype(dt), w_e_ref[:]) + mm(d, w_d_ref[:]) \
        + i_role(z_i) + j_role(z_j)
    t = _ln_mod(t, row(sh_ref), row(sc_ref)).astype(dt)
    g = mm(t, w_c0_ref[:]) + vec1(b_c0_ref)
    g = jax.nn.silu(g).astype(dt)
    inv = jnp.tanh(mm(g, w_c1_ref[:]))             # [TI, N, G]

    if n_gate_heads > 1:
        extra = extra_ref[0].astype(f32)           # [TI, N, G-1]
        gate_sum = inv[..., 0] + jnp.sum(inv[..., 1:] * extra, axis=-1)
    else:
        gate_sum = inv[..., 0]
    inv_mean = gate_sum / n_gate_heads             # [TI, N]

    mask = mask_ref[0].astype(f32)
    r = r_ref[0].astype(f32)
    w = inv_mean * mask * (cn_scale_ref[0] / r)
    w_out_ref[0] = w.astype(w_out_ref.dtype)
