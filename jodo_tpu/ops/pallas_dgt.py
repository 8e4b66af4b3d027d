"""Fully-fused DGT block pair-chain Pallas TPU kernels (sampling path).

Round-1/2 profiling (BASELINE.md r2) showed the sampling step is
HBM/VPU-bound, not MXU-bound: of ~10.9 ms/step at QM9 scale (B=128, N=32)
only ~1.1 ms is matmul; the rest is XLA elementwise fusions, layout
copies and LayerNorms — [B,N,N,C] pair tensors round-tripping HBM
between fusions. These kernels eliminate the round trips: per DGT layer
the 64-channel pair stream is read from HBM exactly twice (once per
kernel) and written exactly once.

Kernel A — `fused_pre_attention`: everything between the residual edge
stream and the attention output, per (batch, i-tile) grid cell:
    GBF time-modulated distance expansion        (ref models/layers.py:314-334)
    edge_emb Dense over concat(dist, e_in)       (ref models/mol_gnn.py:169-173)
    affine-free LayerNorm + adaLN modulation     (ref models/mol_gnn.py:177-186)
    both tanh edge-gate matmuls (MXU)            (ref models/layers.py:165-184)
    extra-head logit injection, masked softmax,
    gated value reduction                        (ref models/layers.py:169-191)
The embedded/modulated edge tensor and both [B,N,N,~H*C] gate tensors
never leave VMEM. Inputs are the raw squared distances [B,N,N] and the
residual edge stream; the concat-Dense is split into per-operand matmuls
(no lane-dim concat in Mosaic).

Kernel B — `fused_edge_equi`: the post-attention pair chain:
    node2edge broadcast add y_i + y_j + b        (ref models/mol_gnn.py:190-191)
    gated residual + LayerNorm + adaLN           (ref models/mol_gnn.py:307-317)
    edge FFN (Ed -> 2Ed -> Ed, MXU)              (ref mol_gnn.py _ff_block)
    equivariant gate chain: z_i + z_j + e W_e +
    GBF(sq) W_d -> LN -> modulate -> coord MLP
    -> tanh -> extra-head mean -> w_ij           (ref models/mol_gnn.py:51-94)
GBF features are recomputed from `sq` in VMEM (cheaper than an HBM round
trip); outputs are the new edge stream e_out and w [B,N,N] — the
position update pos_i += pos_i * rowsum(w) - (w @ pos)_i stays in XLA
(3-lane math).

Node-level matmuls (q/k/v, node2edge projection, node FFN, z_i/z_j, time
MLPs) stay in XLA where they batch over B*N rows at near-peak MXU
utilisation — a per-cell kernel would run them at TI-row granularity.

Implementation notes (what measured fast on this Mosaic, r2 of the
rebuild):
  * Current Mosaic DOES lower single-operand sublane/leading broadcasts
    in adds (i-role [TI,1,C], j-role [1,N,C], bias [1,1,C]) — the r1/r3
    ones-multiply workarounds are obsolete and cost real VPU passes;
    natural broadcasts are used throughout.
  * The Gaussian basis is evaluated in quadratic form
    gb = exp(a*x^2 + b*x + c) with per-channel rows precomputed by the
    wrapper (gbf_quadratic_rows; normalisation inside the exponent so it
    cannot overflow) — no [TI,N,K] means/stds broadcasts in-kernel.
  * Elementwise pair chains and every rank-expanding broadcast run in
    f32 — Mosaic rejects bf16 reshapes at non-128-multiple lane widths
    (e.g. [TI,252] -> [TI,1,252]) — while all matmul inputs are cast to
    the stream dtype (bf16) so the MXU runs at bf16 rate with f32
    accumulation.

Forward-only (sampling / EMA eval); training keeps the autodiff+remat
XLA path (BASELINE.md r2). `interpret=True` off-TPU for CPU tests.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_MASK = -1e30
NEG_EXTRA = -1e10
SQRT_2PI = (2 * 3.14159) ** 0.5  # matches layers._gaussian_basis

__all__ = ["fused_pre_attention", "fused_edge_equi", "gbf_quadratic_rows"]


def gbf_quadratic_rows(means, stds):
    """[1,K-1] means/stds -> (a,b,c) rows for gb = exp(a x^2 + b x + c).

    Algebraically identical to exp(-((x-m)/s)^2/2)/(sqrt(2 pi) s). The
    normalisation rides INSIDE the exponent (c = -m^2/(2 s^2) -
    ln(sqrt(2 pi) s)) so the exponent is bounded above by -ln(sqrt(2 pi) s)
    — the two-factor form exp(a x^2 + b x) * C overflows f32 near x = m
    when s is small."""
    s = jnp.abs(stds) + 1e-5
    inv2 = 1.0 / (s * s)
    a = -0.5 * inv2
    b = means * inv2
    c = -0.5 * means * means * inv2 - jnp.log(SQRT_2PI * s)
    return a, b, c


def _head_matrix(n_channels: int, n_heads: int, ch_per_head: int, dtype):
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (n_channels, n_heads), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (n_channels, n_heads), 1)
    return (c_ids // ch_per_head == h_ids).astype(dtype)


def _ln(x, f32=jnp.float32):
    """Affine-free LN over the lane dim, f32 stats, eps 1e-6.

    Two stat modes (JODO_LN_MODE): 'mxu' computes mean / mean-of-squares
    via [d,8] ones-matmuls (r2 measurement: ~0.05 ms vs ~0.19 ms for the
    VPU lane-tree at [131k,64] rows — but the MXU pads the 8-lane output
    to 128, so each stat matmul costs a full rows x d x 128 pass);
    'vpu' uses jnp.mean lane reductions. Variance by E[x^2]-E[x]^2 in
    f32, clamped against cancellation."""
    xf = x.astype(f32)
    d = x.shape[-1]
    if os.environ.get("JODO_LN_MODE", "mxu") == "vpu":
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        return (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    ones = jnp.full((d, 8), 1.0 / d, f32)
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    s1 = jax.lax.dot_general(xf, ones, dims, preferred_element_type=f32)
    s2 = jax.lax.dot_general(xf * xf, ones, dims,
                             preferred_element_type=f32)
    mean = s1[..., 0:1]
    var = jnp.maximum(s2[..., 0:1] - mean * mean, 0.0)
    return (xf - mean) * jax.lax.rsqrt(var + 1e-6)


def _mm(x, w):
    """[..., Cin] @ [Cin, Cout] -> [..., Cout] f32 (MXU).

    Mosaic requires 32-bit matmul accumulators."""
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)



def _gbf4(sq4, gbf_ss_ref, ga_ref, gb_ref, gc_ref, time_mod, dt):
    """sq4 [BK,TI,N,1] f32 -> (x4 [BK,TI,N,1] f32, gb [BK,TI,N,K-1] dt)."""
    if time_mod:
        # row 0 of the per-graph [BK, N, 2] block -> [BK, 1, 1, 2]
        ss = gbf_ss_ref[:, 0:1, :][:, :, None, :]
        x4 = sq4 * (ss[..., 0:1] + 1.0) + ss[..., 1:2]
    else:
        x4 = sq4
    p = ((x4 * x4) * ga_ref[0][None, None, None, :]
         + x4 * gb_ref[0][None, None, None, :]
         + gc_ref[0][None, None, None, :])
    gb = jnp.exp(p)
    return x4, gb.astype(dt)  # dt for the MXU; x4 stays f32


def _bias4(ref):
    return ref[0][None, None, None, :]


def _pick_blocks(b: int, n: int, bytes_per_row: int, default_mb: int = 6):
    """(BK, TI): batch block and i-tile within the VMEM budget.

    Batch blocking amortises the fixed per-grid-cell overhead that
    dominates at molecule sizes (profiled ~10% of roofline with a
    (batch, 1) grid at B=256/N=24, r2 verdict round). TI divides n and is
    a multiple of 8 (Mosaic sublane granularity); BK divides b."""
    budget = int(os.environ.get("JODO_BLOCK_VMEM_MB", str(default_mb)))
    budget_rows = max(8, (budget * 1024 * 1024) // max(1, bytes_per_row))
    ti = None
    for cand in range(8, n + 1, 8):
        if n % cand == 0 and cand * n <= budget_rows:
            ti = cand
    if ti is None:
        ti = n
    bk_env = os.environ.get("JODO_BLOCK_BK", "auto")
    if bk_env != "auto":
        bk = max(1, int(bk_env))
        while b % bk:
            bk -= 1
        return bk, ti
    bk = 1
    for cand in (2, 4, 8, 16):
        if b % cand == 0 and cand * ti * n <= budget_rows:
            bk = cand
    return bk, ti


# ---------------------------------------------------------------------------
# Kernel A: GBF + edge embed + LN/adaLN + edge-gated attention
# ---------------------------------------------------------------------------

def _pre_attn_kernel(
    sq_ref, e_ref, extra_ref, mask_ref, q_ref, k_ref, v_ref,
    gbf_ss_ref, e_mod_ref,
    ga_ref, gb_ref, gc_ref, w_d0_ref, w_dg_ref, w_ee_ref, b_ee_ref,
    w0_ref, w1_ref,
    out_ref,
    *, sub_heads, sub_ch, heads, out_ch, extra_heads, softmax_inf, scale,
    dist_gbf, gbf_time_mod, cond_time, equivariant, dt,
):
    # rank-expanding broadcasts run in f32 (Mosaic rejects bf16 reshapes
    # at non-128-multiple lane widths); bf16 only feeds the MXU.
    f32 = jnp.float32
    e4 = e_ref[...]  # [BK, TI, N, E] dt

    if equivariant:
        sq4 = sq_ref[...][:, :, :, None]  # [BK, TI, N, 1] f32
        if dist_gbf:
            x4, gb = _gbf4(sq4, gbf_ss_ref, ga_ref, gb_ref, gc_ref,
                           gbf_time_mod, dt)
            emb = (
                x4 * _bias4(w_d0_ref)
                + _mm(gb, w_dg_ref[:].astype(dt))
                + _mm(e4, w_ee_ref[:].astype(dt))
                + _bias4(b_ee_ref)
            )
        else:
            emb = (
                sq4 * _bias4(w_d0_ref)
                + _mm(e4, w_ee_ref[:].astype(dt))
                + _bias4(b_ee_ref)
            )
    else:
        emb = e4

    e_att = _ln(emb)
    if cond_time:
        ed = e_mod_ref.shape[-1] // 2
        m = e_mod_ref[:, 0:1, :][:, :, None, :].astype(f32)  # [BK,1,1,2Ed]
        e_att = e_att * (1.0 + m[..., ed:]) + m[..., :ed]
    e_att = e_att.astype(dt)

    ea = jnp.tanh(_mm(e_att, w0_ref[:].astype(dt)))  # [BK,TI,N,SH*SC] f32
    ev = jnp.tanh(_mm(e_att, w1_ref[:].astype(dt)))  # [BK,TI,N,H*C] f32

    q = q_ref[...].astype(f32)  # [BK, TI, SH*SC]
    k = k_ref[...].astype(f32)  # [BK, N, SH*SC]
    v = v_ref[...].astype(f32)  # [BK, N, H*C]

    p = q[:, :, None, :] * k[:, None, :, :] * ea  # f32
    s_sub = _head_matrix(sub_heads * sub_ch, sub_heads, sub_ch, f32)
    logits_sub = _mm(p, s_sub) * scale  # [BK, TI, N, SH] f32

    if extra_heads > 0:
        extra = extra_ref[...].astype(f32)  # [BK, TI, N, XH]
        if softmax_inf:
            extra = jnp.where(extra == 0.0, NEG_EXTRA, extra)
        ex_sel = _head_matrix(extra_heads, extra_heads, 1, f32)
        ex_pad = jnp.pad(ex_sel, ((0, 0), (0, sub_heads)))
        sub_pad = jnp.pad(
            jnp.eye(sub_heads, dtype=f32), ((0, 0), (extra_heads, 0))
        )
        logits = _mm(extra, ex_pad) + _mm(logits_sub, sub_pad)
    else:
        logits = logits_sub

    mask = mask_ref[...][:, :, :, None]
    logits = jnp.where(mask > 0, logits, NEG_MASK)
    logits = logits - jnp.max(logits, axis=2, keepdims=True)
    unnorm = jnp.exp(logits) * mask
    denom = jnp.maximum(jnp.sum(unnorm, axis=2, keepdims=True), 1e-20)
    alpha = unnorm / denom  # [BK, TI, N, H] f32

    e_full = _head_matrix(heads * out_ch, heads, out_ch, f32).T
    alpha_chan = _mm(alpha, e_full)  # [BK, TI, N, H*C] f32
    out = jnp.sum(alpha_chan * v[:, None, :, :] * ev, axis=2)
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sub_heads", "sub_ch", "heads", "out_ch", "extra_heads",
        "softmax_inf", "dist_gbf", "gbf_time_mod", "cond_time",
        "equivariant", "interpret",
    ),
)
def fused_pre_attention(
    sq, e_in, extra_adj, edge_mask, q, k, v,
    gbf_ss, e_mod, means, stds, w_d0, w_dg, w_ee, b_ee, w0, w1,
    *, sub_heads, sub_ch, heads, out_ch, extra_heads=0, softmax_inf=True,
    dist_gbf=True, gbf_time_mod=True, cond_time=True, equivariant=True,
    interpret=False,
):
    """sq [B,N,N] f32; e_in [B,N,N,E]; extra_adj [B,N,N,XH] or None;
    edge_mask [B,N,N]; q/k [B,N,SH*SC]; v [B,N,H*C];
    gbf_ss [B,2] f32 (time scale/shift of sq); e_mod [B,2*Eh]
    (shift ++ scale); means/stds [1,K-1] f32; w_d0 [1,Eh] (dist channel-0
    row); w_dg [K-1,Eh]; w_ee [E,Eh]; b_ee [1,Eh]; w0 [Eh,SH*SC];
    w1 [Eh,H*C]  ->  attention output [B,N,H*C]."""
    b, n = sq.shape[0], sq.shape[1]
    dt = e_in.dtype
    if extra_adj is None:
        extra_adj = jnp.zeros((b, n, n, 1), dt)

    ga, gbq, gc = gbf_quadratic_rows(means, stds)

    # live per-row working set ~ gates + p + alpha_chan in f32
    bytes_per_row = (3 * heads * out_ch + 2 * w_ee.shape[1]) * 4 \
        + 3 * heads * 4
    bk, tile_i = _pick_blocks(b, n, bytes_per_row)
    grid = (b // bk, n // tile_i)

    kernel = functools.partial(
        _pre_attn_kernel,
        sub_heads=sub_heads, sub_ch=sub_ch, heads=heads, out_ch=out_ch,
        extra_heads=extra_heads, softmax_inf=softmax_inf,
        scale=1.0 / math.sqrt(out_ch), dist_gbf=dist_gbf,
        gbf_time_mod=gbf_time_mod, cond_time=cond_time,
        equivariant=equivariant, dt=dt,
    )

    # per-graph vectors ride as [B, N, C] (wrapper broadcast; (1, C) row
    # blocks are rejected by Mosaic) — kernels read row 0
    gbf_b = jnp.broadcast_to(gbf_ss[:, None, :], (b, n, 2))
    emod_b = jnp.broadcast_to(e_mod[:, None, :], (b, n, e_mod.shape[-1]))
    vec = lambda a: pl.BlockSpec((bk, n, a.shape[-1]), lambda bi, it: (bi, 0, 0))  # noqa: E731
    mat = lambda w_: pl.BlockSpec(w_.shape, lambda bi, it: (0,) * w_.ndim)  # noqa: E731

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, tile_i, n), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((bk, tile_i, n, e_in.shape[-1]),
                         lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((bk, tile_i, n, extra_adj.shape[-1]),
                         lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((bk, tile_i, n), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((bk, tile_i, q.shape[-1]), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((bk, n, k.shape[-1]), lambda bi, it: (bi, 0, 0)),
            pl.BlockSpec((bk, n, v.shape[-1]), lambda bi, it: (bi, 0, 0)),
            vec(gbf_b), vec(emod_b),
            mat(ga), mat(gbq), mat(gc), mat(w_d0), mat(w_dg), mat(w_ee),
            mat(b_ee), mat(w0), mat(w1),
        ],
        out_specs=pl.BlockSpec(
            (bk, tile_i, heads * out_ch), lambda bi, it: (bi, it, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, heads * out_ch), dt),
        interpret=interpret,
    )(
        sq, e_in, extra_adj, edge_mask, q, k, v,
        gbf_b, emod_b,
        ga, gbq, gc, w_d0, w_dg, w_ee, b_ee, w0, w1,
    )


# ---------------------------------------------------------------------------
# Kernel B: node2edge + gated residual + edge FFN + equivariant gate chain
# ---------------------------------------------------------------------------

def _edge_equi_kernel(
    sq_ref, e_ref, extra_ref, mask_ref,
    yi_ref, yall_ref, zi_ref, zall_ref,
    gbf_ss_ref, e_mod_ref, eq_ss_ref,
    b_n2e_ref, w_f0_ref, b_f0_ref, w_f1_ref, b_f1_ref,
    ga_ref, gb_ref, gc_ref, w_ed_ref, w_d0_ref, w_dg_ref,
    w_c0_ref, b_c0_ref, w_c1_ref, cn_ref,
    e_out_ref, w_out_ref,
    *, n_gate_heads, dist_gbf, gbf_time_mod, cond_time, equivariant, dt,
):
    bkd = sq_ref.shape[0]
    ti = sq_ref.shape[1]
    n = sq_ref.shape[2]
    ed = e_ref.shape[-1]
    f32 = jnp.float32

    e_in = e_ref[...].astype(f32)  # [BK, TI, N, Ed]

    # node2edge broadcast add (f32 rank-expands; see kernel A note)
    y_i = yi_ref[...].astype(f32)  # [BK, TI, Ed]
    y_all = yall_ref[...].astype(f32)  # [BK, N, Ed]
    h_edge = y_i[:, :, None, :] + y_all[:, None, :, :] + _bias4(b_n2e_ref)

    if cond_time:
        m = e_mod_ref[:, 0:1, :][:, :, None, :].astype(f32)  # [BK,1,1,4Ed]
        eg_msa = m[..., 0 * ed:1 * ed]
        es_mlp = m[..., 1 * ed:2 * ed]
        esc_mlp = m[..., 2 * ed:3 * ed]
        eg_mlp = m[..., 3 * ed:4 * ed]
        e_mid = e_in + eg_msa * h_edge
        e_ln = _ln(e_mid) * (1.0 + esc_mlp) + es_mlp
    else:
        e_mid = e_in + h_edge
        e_ln = _ln(e_mid)

    f = _mm(e_ln.astype(dt), w_f0_ref[:].astype(dt)) + _bias4(b_f0_ref)
    f = f * jax.lax.logistic(f)  # silu, f32
    f = _mm(f.astype(dt), w_f1_ref[:].astype(dt)) + _bias4(b_f1_ref)
    # residual base is the POST-LN modulated stream (mol_gnn.py:307-317)
    if cond_time:
        e_out = e_ln + eg_mlp * f
    else:
        e_out = e_ln + f
    e_out_dt = e_out.astype(dt)
    e_out_ref[...] = e_out_dt

    if not equivariant:
        w_out_ref[...] = jnp.zeros((bkd, ti, n), f32)
        return

    # equivariant gate chain on the fresh edge stream
    sq4 = sq_ref[...][:, :, :, None]  # [BK, TI, N, 1]
    z_i = zi_ref[...].astype(f32)  # [BK, TI, Hd]
    z_all = zall_ref[...].astype(f32)  # [BK, N, Hd]
    t = (_mm(e_out_dt, w_ed_ref[:].astype(dt))
         + z_i[:, :, None, :] + z_all[:, None, :, :])
    if dist_gbf:
        x4, gb = _gbf4(sq4, gbf_ss_ref, ga_ref, gb_ref, gc_ref,
                       gbf_time_mod, dt)
        t = t + x4 * _bias4(w_d0_ref) + _mm(gb, w_dg_ref[:].astype(dt))
    else:
        t = t + sq4 * _bias4(w_d0_ref)

    hd = zi_ref.shape[-1]
    eqm = eq_ss_ref[:, 0:1, :][:, :, None, :].astype(f32)  # [BK,1,1,2Hd]
    t = _ln(t) * (1.0 + eqm[..., hd:]) + eqm[..., :hd]
    g = _mm(t.astype(dt), w_c0_ref[:].astype(dt)) + _bias4(b_c0_ref)
    g = g * jax.lax.logistic(g)  # silu, f32
    inv = jnp.tanh(_mm(g.astype(dt), w_c1_ref[:].astype(dt)))  # [BK,TI,N,NG]

    if n_gate_heads > 1:
        extra = extra_ref[...].astype(f32)  # [BK, TI, N, NG-1]
        gate_sum = inv[..., 0] + jnp.sum(inv[..., 1:] * extra, axis=-1)
    else:
        gate_sum = inv[..., 0]
    inv_mean = gate_sum / n_gate_heads  # [BK, TI, N]

    mask = mask_ref[...].astype(f32)
    r = jnp.sqrt(jnp.maximum(sq_ref[...], 1e-16))
    w_out_ref[...] = inv_mean * mask * (cn_ref[0, 0] / r)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_gate_heads", "dist_gbf", "gbf_time_mod", "cond_time",
        "equivariant", "interpret",
    ),
)
def fused_edge_equi(
    sq, e_in, extra_adj, edge_mask, y, z_i, z_j,
    gbf_ss, e_mod, eq_ss, cn_scale,
    b_n2e, w_f0, b_f0, w_f1, b_f1,
    means, stds, w_ed, w_d0, w_dg, w_c0, b_c0, w_c1,
    *, n_gate_heads=1, dist_gbf=True, gbf_time_mod=True, cond_time=True,
    equivariant=True, interpret=False,
):
    """sq [B,N,N] f32; e_in [B,N,N,Ed]; extra_adj [B,N,N,NG-1] or None;
    edge_mask [B,N,N]; y [B,N,Ed] (node2edge projection of the attention
    output, bias separate); z_i [B,N,Hd] (equi input_lin_i with bias);
    z_j [B,N,Hd]; gbf_ss [B,2] f32; e_mod [B,4*Ed]
    (eg_msa ++ es_mlp ++ esc_mlp ++ eg_mlp); eq_ss [B,2*Hd]
    (shift ++ scale); cn_scale [1,1] f32; w_d0/w_dg split rows of the equi
    dist kernel. Returns (e_out [B,N,N,Ed], w [B,N,N] f32)."""
    b, n = sq.shape[0], sq.shape[1]
    dt = e_in.dtype
    ed = e_in.shape[-1]
    hd = z_i.shape[-1]
    if extra_adj is None or n_gate_heads == 1:
        extra_adj = jnp.zeros((b, n, n, 1), dt)

    ga, gbq, gc = gbf_quadratic_rows(means, stds)

    bytes_per_row = (3 * hd + 8 * ed) * 4
    bk, tile_i = _pick_blocks(b, n, bytes_per_row)
    grid = (b // bk, n // tile_i)

    kernel = functools.partial(
        _edge_equi_kernel,
        n_gate_heads=n_gate_heads, dist_gbf=dist_gbf,
        gbf_time_mod=gbf_time_mod, cond_time=cond_time,
        equivariant=equivariant, dt=dt,
    )

    gbf_b = jnp.broadcast_to(gbf_ss[:, None, :], (b, n, 2))
    emod_b = jnp.broadcast_to(e_mod[:, None, :], (b, n, e_mod.shape[-1]))
    eqss_b = jnp.broadcast_to(eq_ss[:, None, :], (b, n, eq_ss.shape[-1]))
    vec = lambda a: pl.BlockSpec((bk, n, a.shape[-1]), lambda bi, it: (bi, 0, 0))  # noqa: E731
    mat = lambda w_: pl.BlockSpec(w_.shape, lambda bi, it: (0,) * w_.ndim)  # noqa: E731

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk, tile_i, n), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((bk, tile_i, n, ed), lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((bk, tile_i, n, extra_adj.shape[-1]),
                         lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((bk, tile_i, n), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((bk, tile_i, ed), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((bk, n, ed), lambda bi, it: (bi, 0, 0)),
            pl.BlockSpec((bk, tile_i, hd), lambda bi, it: (bi, it, 0)),
            pl.BlockSpec((bk, n, hd), lambda bi, it: (bi, 0, 0)),
            vec(gbf_b), vec(emod_b), vec(eqss_b),
            mat(b_n2e), mat(w_f0), mat(b_f0), mat(w_f1), mat(b_f1),
            mat(ga), mat(gbq), mat(gc), mat(w_ed), mat(w_d0), mat(w_dg),
            mat(w_c0), mat(b_c0), mat(w_c1), mat(cn_scale),
        ],
        out_specs=[
            pl.BlockSpec((bk, tile_i, n, ed), lambda bi, it: (bi, it, 0, 0)),
            pl.BlockSpec((bk, tile_i, n), lambda bi, it: (bi, it, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, n, ed), dt),
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        sq, e_in, extra_adj, edge_mask,
        y, y, z_i, z_j,
        gbf_b, emod_b, eqss_b,
        b_n2e, w_f0, b_f0, w_f1, b_f1,
        ga, gbq, gc, w_ed, w_d0, w_dg, w_c0, b_c0, w_c1, cn_scale,
    )
