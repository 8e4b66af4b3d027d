"""Diffusion Graph Transformer family, dense TPU-native.

One configurable flax module covers the reference's four DGT variants:
  * DGT         <- DGT_concat        (mol_gnn.py:410-594)   equivariant=True,  extra heads
  * CondDGT     <- Cond_DGT_concat   (mol_gnn.py:597-794)   + property context
  * DGT2D       <- DGT_concat_2D     (mol_gnn.py:797-946)   equivariant=False
  * DGTSim      <- DGT_concat_sim    (mol_gnn.py:949-1124)  extra_heads=0

Forward contract (dense; the portability seam of SURVEY.md section 3.3):
  inputs : t [B], xh [B,N,3+C] (or [B,N,C] in 2D), node_mask [B,N],
           edge_mask [B,N,N], edge_x [B,N,N,E], noise_level [B],
           cond_x / cond_edge_x (self-conditioning, zeros when absent),
           cond_flag scalar {0.,1.} (whether cond_* carries a prediction),
           context [B,P] (conditional models only)
  outputs: (pred [B,N,3+C], edge_pred [B,N,N,E]) — CoM-free positions,
           symmetric edges.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import remove_mean_with_mask
from ..ops.features import pairwise_sq_dist
from .layers import _pair_dense
from .layers import (
    GBF_LAYERS,
    CoorsNorm,
    DenseTransMixLayer,
    GatedFFN,
    TimeMLP,
    layer_norm,
    modulate,
    _silu,
)


class EquivariantCoordUpdate(nn.Module):
    """Equivariant position update (MultiCondEquiUpdate, mol_gnn.py:51-94).

    pos_i += sum_j coorsnorm(pos_i - pos_j) * mean_heads(tanh(mlp_ij) * adjs)
    """

    hidden_dim: int
    extra_heads: int = 0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False  # measured slower than XLA here; off by default
    # algebraic LN fold (see _folded_gate): exactness-tested but measured
    # SLOWER than the materialised path at every production bucket shape
    # (benchmarks/fold_ab.py; BASELINE.md r5) — the f32 stats einsums and
    # the extra [B,N,N,M] quadratic-form tensor cost more than the fold
    # saves. Kept as a documented negative result; off by default.
    fold_ln: bool = False

    @nn.compact
    def __call__(self, h, pos, edge_feat, dist_feat, edge_mask, time_emb,
                 extra_adj, deterministic=True):
        b, n, _ = pos.shape
        dt = self.dtype
        hd = self.hidden_dim
        # Dense([h_i, h_j, e_ij, d_ij]) factored into per-node matmuls +
        # broadcast adds: W1 h_i + W2 h_j + W3 e + W4 d + bias. Exactly the
        # same affine map as the concat formulation but O(B N D^2) instead
        # of O(B N^2 D^2) FLOPs for the node terms. The pair-side weights
        # are raw kernels so the fused Pallas path can run them in VMEM.
        kernel_init = nn.initializers.lecun_normal()
        y_i = nn.Dense(hd, dtype=dt, name="input_lin_i")(h)  # carries bias
        y_j = nn.Dense(hd, use_bias=False, dtype=dt, name="input_lin_j")(h)
        w_e = self.param("input_lin_e_kernel", kernel_init,
                         (edge_feat.shape[-1], hd))
        w_d = self.param("input_lin_d_kernel", kernel_init,
                         (dist_feat.shape[-1], hd))
        w_c0 = self.param("coord_mlp_0_kernel", kernel_init, (hd, hd))
        b_c0 = self.param("coord_mlp_0_bias", nn.initializers.zeros, (hd,))
        w_c1 = self.param("coord_mlp_1_kernel", kernel_init,
                          (hd, 1 + self.extra_heads))
        cn_scale = self.param(
            "coord_norm_scale", lambda *_: jnp.full((1,), 1e-2, jnp.float32)
        )

        if time_emb is not None:
            ss = nn.Dense(hd * 2, dtype=dt, name="time_mlp")(nn.silu(time_emb))
            shift, scale = jnp.split(ss, 2, axis=-1)
        else:
            shift = jnp.zeros((b, hd), dt)
            scale = jnp.zeros((b, hd), dt)

        if self.extra_heads > 0 and extra_adj is not None:
            if extra_adj.shape[-1] != self.extra_heads:
                extra_adj = jnp.repeat(
                    extra_adj, self.extra_heads // extra_adj.shape[-1], axis=-1
                )

        # fused kernel is forward-only (no VJP): inference path only
        if self.use_pallas and deterministic:
            from ..ops.pallas_equi import fused_equi_update

            interpret = jax.default_backend() != "tpu"
            inv = fused_equi_update(
                y_i, y_j, edge_feat.astype(dt), dist_feat.astype(dt),
                extra_adj if self.extra_heads > 0 else None,
                shift, scale,
                w_e.astype(dt), w_d.astype(dt), w_c0.astype(dt),
                b_c0, w_c1.astype(dt),
                extra_heads=self.extra_heads, interpret=interpret,
            )[..., None]
        elif self.fold_ln:
            # algebraic LN/modulate fold: the [B,N,N,hd] tensors y_ed, inp
            # and the normalised stream are never materialised — the step
            # is HBM-bound on exactly those hd-wide pair tensors (r3 HLO
            # trace: the equi chain is ~40% of per-step traffic). Math:
            #   inp = a_i (+bias) + b_j + (e||d) @ W          (affine)
            #   LN stats are contractions: mean is linear in the three
            #   terms; E[inp^2] expands into per-node sums, a_i.b_j Gram
            #   matmuls and (e||d)-side quadratic forms (all MXU work).
            #   modulate+matmul folds per-graph: norm*(1+s) @ w_c0 =
            #   rstd*[inp @ (diag(1+s) w_c0)] - rstd*mu*[(1+s) w_c0] + ...
            # so the only hd-wide pair tensor left is the single matmul
            # output P, consumed once by the fused silu+gate reductions.
            inv = self._folded_gate(
                y_i, y_j, edge_feat.astype(dt), dist_feat.astype(dt),
                w_e, w_d, w_c0, b_c0, w_c1, shift, scale, extra_adj, dt,
            )
        else:
            # one [2E -> hd] pair matmul instead of two [E -> hd]: same
            # affine map (params stay separate for the fused kernels /
            # converters), one hd-wide pair-tensor write instead of two
            # plus an add
            y_ed = jnp.concatenate(
                [edge_feat.astype(dt), dist_feat.astype(dt)], axis=-1
            ) @ jnp.concatenate([w_e.astype(dt), w_d.astype(dt)], axis=0)
            inp = y_i[:, :, None, :] + y_j[:, None, :, :] + y_ed
            g = layer_norm(inp)
            g = modulate(g, shift, scale)
            g = g @ w_c0.astype(dt) + b_c0.astype(dt)
            g = _silu(g)
            # final gate-head matmul decomposed into per-head lane
            # reductions: a [B,N,N,1+extra] output pads its 1-3 lanes to
            # 128 on TPU (~40x HBM inflation; its producer+consumer
            # fusions measured ~1.5 ms/step at QM9 sampling scale), while
            # [B,N,N] reductions over g fuse cleanly. tanh/means in f32
            # (position update math stays f32 for geometric precision).
            inv = self._gate_heads(g, w_c1.astype(dt), extra_adj)

        # trans_ij = (p_i - p_j)/max(r_ij, eps) * scale * inv_ij * mask_ij,
        # (gate math above; position update below is path-independent)
        # summed over j. Factored as p_i * rowsum(w) - w @ p with
        # w_ij = scale * inv_ij * mask_ij / max(r_ij, eps): no [B,N,N,3]
        # pair tensor is ever materialised and the reduction is one MXU
        # matmul instead of a 3-lane elementwise+reduce chain.
        # r_sq via direct differences (accurate for near-coincident atoms,
        # unlike the |p_i|^2+|p_j|^2-2p_i.p_j form); XLA fuses the c-axis
        # reduce so no [B,N,N,3] tensor is written.
        posf = pos.astype(jnp.float32)
        diff = posf[:, :, None, :] - posf[:, None, :, :]
        r_sq = jnp.sum(diff * diff, axis=-1)  # [B,N,N]
        r = jnp.sqrt(jnp.maximum(r_sq, 1e-16))
        w = inv[..., 0] * edge_mask * (cn_scale[0] / r)  # [B,N,N]
        rowsum = jnp.sum(w, axis=2, keepdims=True)  # [B,N,1]
        return pos + posf * rowsum - jnp.einsum("bij,bjc->bic", w, posf)

    def _gate_heads(self, g, w_c1_f, extra_adj):
        """Per-head lane reductions tanh(g . w_c1[:,h]) -> mean/adj-weighted
        combination (reference mol_gnn.py:84-94)."""
        n_gate = 1 + self.extra_heads

        if os.environ.get("JODO_EQUI_GATE") == "packed":
            # one pass over g: contract all heads at once with the head
            # axis placed SECOND ([B,M,N,N]) so the minor dim is N (sublane
            # pad only), not the 1+extra lane dim a [B,N,N,M] output would
            # pad 43x to 128 lanes (r2 measurement; docstring above)
            t = jnp.tanh(jnp.einsum(
                "bijc,cm->bmij", g, w_c1_f,
                preferred_element_type=jnp.float32,
            ))
            gate = t[:, 0]
            for hh in range(1, n_gate):
                if extra_adj is not None:
                    gate = gate + t[:, hh] * extra_adj[..., hh - 1].astype(
                        jnp.float32)
                else:
                    gate = gate + t[:, hh]
            return (gate / n_gate)[..., None]

        def head(hh):
            return jnp.tanh(jnp.einsum(
                "bijc,c->bij", g, w_c1_f[:, hh],
                preferred_element_type=jnp.float32,
            ))

        gate = head(0)
        for hh in range(1, n_gate):
            if extra_adj is not None:
                gate = gate + head(hh) * extra_adj[..., hh - 1].astype(
                    jnp.float32)
            else:  # all-heads mean with ones adjacency
                gate = gate + head(hh)
        return (gate / n_gate)[..., None]

    def _folded_gate(self, y_i, y_j, edge_feat, dist_feat,
                     w_e, w_d, w_c0, b_c0, w_c1, shift, scale, extra_adj,
                     dt):
        """LN+modulate+coord_mlp_0 with the normalisation folded into the
        matmul (exact same affine map as the materialised path; see the
        call-site comment). All statistics accumulate in f32.

        Derivation: with inp = a_i + b_j + p_ij, p = (e||d) @ W,
          mean_ij = abar_i + bbar_j + (e||d)_ij @ rowmean(W)
          E[inp^2]_ij = (sum a^2 + sum b^2 + p.p + 2(a.b + a.p + b.p))/C
        where a.b is a Gram matmul, a.p = (e||d).(W a_i), p.p the quadratic
        form (e||d) W W^T (e||d)^T. Then
          silu(modulate(LN(inp), sh, sc) @ w_c0 + b) =
          silu(rstd * [inp @ W' - mean * u] + v),  W' = diag(1+sc) w_c0,
          u = (1+sc) @ w_c0, v = sh @ w_c0 + b.
        """
        f32 = jnp.float32
        hd = self.hidden_dim
        ed = jnp.concatenate([edge_feat, dist_feat], axis=-1)  # [B,N,N,M]
        W = jnp.concatenate([w_e, w_d], axis=0).astype(f32)  # [M, hd]
        one_scale = 1.0 + scale.astype(f32)  # [B, hd]
        w0f = w_c0.astype(f32)

        # per-graph modulated kernels / offsets
        m_b = jnp.einsum("mk,bk,kc->bmc", W, one_scale, w0f)  # [B,M,hd]
        u = one_scale @ w0f  # [B, hd]
        v = shift.astype(f32) @ w0f + b_c0.astype(f32)[None, :]  # [B, hd]

        af = y_i.astype(f32)  # [B,N,hd] (carries the input_lin_i bias)
        bf = y_j.astype(f32)
        z_i = (af * one_scale[:, None, :]) @ w0f  # [B,N,hd]
        z_j = (bf * one_scale[:, None, :]) @ w0f

        # LN statistics via contractions (f32 accumulation)
        abar = jnp.mean(af, -1)  # [B,N]
        bbar = jnp.mean(bf, -1)
        sa = jnp.sum(af * af, -1)
        sb = jnp.sum(bf * bf, -1)
        gram = jnp.einsum("bic,bjc->bij", af, bf)  # [B,N,N]
        wbar = jnp.mean(W, axis=1)  # [M]
        a_w = af @ W.T  # [B,N,M]
        b_w = bf @ W.T
        q = W @ W.T  # [M,M]
        t = jnp.einsum(
            "bijm,mn->bijn", ed, q.astype(dt),
            preferred_element_type=f32,
        ).astype(dt)  # [B,N,N,M]
        pbar = jnp.einsum("bijm,m->bij", ed, wbar.astype(dt),
                          preferred_element_type=f32)
        cross_a = jnp.einsum("bijm,bim->bij", ed, a_w.astype(dt),
                             preferred_element_type=f32)
        cross_b = jnp.einsum("bijm,bjm->bij", ed, b_w.astype(dt),
                             preferred_element_type=f32)
        sp = jnp.einsum("bijm,bijm->bij", ed, t,
                        preferred_element_type=f32)

        c = float(hd)
        # pbar is already the channel MEAN of p (wbar is a row mean)
        mu = abar[:, :, None] + bbar[:, None, :] + pbar
        ex2 = (sa[:, :, None] + sb[:, None, :] + sp
               + 2.0 * (gram + cross_a + cross_b)) / c
        var = jnp.maximum(ex2 - mu * mu, 0.0)
        rstd = jax.lax.rsqrt(var + 1e-6)  # matches layer_norm eps

        # the single hd-wide pair tensor: P = (e||d) @ m_b  (MXU)
        p_mod = jnp.einsum(
            "bijm,bmc->bijc", ed, m_b.astype(dt),
            preferred_element_type=f32,
        ).astype(dt)
        pre = (p_mod
               + z_i.astype(dt)[:, :, None, :]
               + z_j.astype(dt)[:, None, :, :]).astype(f32)
        out = (pre * rstd[..., None]
               + (v[:, None, None, :]
                  - (rstd * mu)[..., None] * u[:, None, None, :]))
        g = _silu(out)  # f32, fused into the gate reductions below
        return self._gate_heads(g, w_c1.astype(f32), extra_adj)


class DGTBlock(nn.Module):
    """Equivariant(Mix)Block / EquivariantMixBlock_2D (mol_gnn.py:97-407).

    adaLN-style 6-way time modulation for nodes and edges, edge-biased
    attention, node->edge update, gated FFNs, optional equivariant position
    update. The residual stream is re-normalised every block (the reference
    applies norm2 *inside* the stream, mol_gnn.py:307-317).
    """

    node_dim: int
    edge_dim: int
    heads: int
    extra_heads: int
    cond_time: bool
    dist_gbf: bool
    softmax_inf: bool
    equivariant: bool = True
    mlp_ratio: int = 2
    dropout: float = 0.0
    gbf_name: str = "CondGaussianLayer"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_equi: bool = False
    fold_equi_ln: bool = False  # LN fold: exact but slower (BASELINE.md r5)
    use_pallas_edge_chain: bool = False  # fused post-attn edge+equi kernel
    use_pallas_block: bool = False  # fully-fused pair chain (ops/pallas_dgt)
    remat_attn: bool = True
    remat_ffn: bool = False  # recompute edge FFN (+ its dropout masks) in bwd

    @nn.compact
    def __call__(
        self,
        pos,
        h,
        edge_attr,
        node_mask,
        edge_mask,
        extra_adj=None,
        node_time_emb=None,
        edge_time_emb=None,
        deterministic=True,
    ):
        # fully-fused sampling path: both pair-chain kernels of
        # ops/pallas_dgt.py; the pair stream never round-trips HBM between
        # fusions. Training/2D keep the XLA path below.
        if self.use_pallas_block and deterministic and self.equivariant:
            return self._fused_block(
                pos, h, edge_attr, node_mask, edge_mask, extra_adj,
                node_time_emb, edge_time_emb,
            )

        h_in, e_in = h, edge_attr
        dist_feat = None

        if self.equivariant:
            sq_dist = pairwise_sq_dist(pos)[..., None]  # [B,N,N,1]
            if self.dist_gbf:
                dist_dim = self.edge_dim
                # cast to the stream dtype at creation: both consumers
                # (edge_emb, equi y_d) cast anyway, so this halves the
                # materialised pair-tensor traffic with identical numerics
                dist_feat = GBF_LAYERS[self.gbf_name](dist_dim, name="dist_layer")(
                    sq_dist, edge_time_emb
                ).astype(self.dtype)
            else:
                dist_feat = sq_dist
            edge_attr = _pair_dense(
                nn.Dense(self.edge_dim, dtype=self.dtype, name="edge_emb"),
                jnp.concatenate([dist_feat.astype(self.dtype), edge_attr], axis=-1),
            )

        if self.cond_time:
            n_mod = nn.Dense(self.node_dim * 6, dtype=self.dtype, name="node_time_mlp")(
                nn.silu(node_time_emb)
            )
            e_mod = nn.Dense(self.edge_dim * 6, dtype=self.dtype, name="edge_time_mlp")(
                nn.silu(edge_time_emb)
            )
            (ns_msa, nsc_msa, ng_msa, ns_mlp, nsc_mlp, ng_mlp) = jnp.split(n_mod, 6, -1)
            (es_msa, esc_msa, eg_msa, es_mlp, esc_mlp, eg_mlp) = jnp.split(e_mod, 6, -1)
            h = modulate(layer_norm(h), ns_msa, nsc_msa)
            edge_attr = modulate(layer_norm(edge_attr), es_msa, esc_msa)
        else:
            h = layer_norm(h)
            edge_attr = layer_norm(edge_attr)

        # remat: recompute the attention in the backward pass instead of
        # saving its [B,N,N,~256]-sized tanh gate tensors as residuals —
        # profiling shows XLA otherwise materialises them as f32
        # layout-changing copies (~4.4 ms/step at QM9 scale, r2 BASELINE)
        attn_cls = (
            nn.remat(DenseTransMixLayer, static_argnums=(5,))
            if self.remat_attn else DenseTransMixLayer
        )
        h_node = attn_cls(
            node_dim=self.node_dim,
            heads=self.heads,
            extra_heads=self.extra_heads,
            softmax_inf=self.softmax_inf,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="attn",
        )(h, edge_attr, edge_mask, extra_adj, deterministic)

        # Dense(h_i + h_j) == Wh_i + Wh_j + b: apply the matmul per node
        # ([B,N,D] rows) and broadcast-add, instead of a [B,N,N,D] matmul
        y = nn.Dense(self.edge_dim, use_bias=False, dtype=self.dtype, name="node2edge_lin")(h_node)
        n2e_bias = self.param(
            "node2edge_bias", nn.initializers.zeros, (self.edge_dim,)
        )

        # node stream first (needed by both edge paths)
        nm = node_mask[..., None]
        if self.cond_time:
            h_node = h_in + modulate_gate(ng_msa, h_node)
            h_node = modulate(layer_norm(h_node), ns_mlp, nsc_mlp) * nm
            h_out = (
                h_node
                + modulate_gate(
                    ng_mlp,
                    GatedFFN(self.node_dim, self.mlp_ratio, self.dropout,
                             dtype=self.dtype, name="ff_node")(
                        h_node, deterministic
                    ),
                )
            ) * nm
        else:
            h_node = h_in + h_node
            h_node = layer_norm(h_node) * nm
            h_out = (
                h_node
                + GatedFFN(self.node_dim, self.mlp_ratio, self.dropout,
                           dtype=self.dtype, name="ff_node")(
                    h_node, deterministic
                )
            ) * nm

        # remat_ffn: recompute the edge FFN in the backward pass instead of
        # saving its [B,N,N,mlp_ratio*Ed] hidden + two dropout masks as
        # residuals — at dropout 0.1 those masks are the dominant train-
        # step memory traffic (~13 ms/step at QM9 flagship, BASELINE.md
        # r3); the recompute is two cheap 64-wide pair matmuls. flax remat
        # replays make_rng('dropout') deterministically so fwd/bwd masks
        # agree.
        ffn_cls = (nn.remat(GatedFFN, static_argnums=(2,))
                   if self.remat_ffn else GatedFFN)
        ffn_edge = ffn_cls(self.edge_dim, self.mlp_ratio, self.dropout,
                           dtype=self.dtype, name="ff_edge")
        equi = EquivariantCoordUpdate(
            self.node_dim, self.extra_heads, dtype=self.dtype,
            use_pallas=self.use_pallas_equi, fold_ln=self.fold_equi_ln,
            name="equi_update"
        ) if self.equivariant else None

        # fused Pallas path: the whole post-attention pair-tensor chain
        # (node2edge -> gated residual -> LN/mod -> edge FFN -> equi gate)
        # in one kernel; probe calls instantiate the identical param tree
        # so checkpoints/converters are path-independent.
        fused = (
            self.use_pallas_edge_chain and deterministic and self.equivariant
            and not (self.dropout > 0.0 and not deterministic)
        )
        if fused:
            e_out, pos = self._fused_edge_chain(
                y, n2e_bias, e_in, dist_feat, extra_adj, edge_mask,
                h_out, pos, ffn_edge, equi,
                (eg_msa, es_mlp, esc_mlp, eg_mlp) if self.cond_time else None,
                edge_time_emb, deterministic,
            )
            return h_out, e_out, pos

        h_edge = y[:, :, None, :] + y[:, None, :, :] + n2e_bias.astype(self.dtype)
        if self.cond_time:
            h_edge = e_in + modulate_gate(eg_msa, h_edge, pair=True)
            h_edge = modulate(layer_norm(h_edge), es_mlp, esc_mlp)
            e_out = h_edge + modulate_gate(
                eg_mlp, ffn_edge(h_edge, deterministic), pair=True,
            )
        else:
            h_edge = e_in + h_edge
            h_edge = layer_norm(h_edge)
            e_out = h_edge + ffn_edge(h_edge, deterministic)

        if self.equivariant:
            pos = equi(h_out, pos, e_out, dist_feat, edge_mask,
                       edge_time_emb, extra_adj, deterministic)

        return h_out, e_out, pos

    def _fused_block(self, pos, h, e_in, node_mask, edge_mask, extra_adj,
                     node_time_emb, edge_time_emb):
        """Fully-fused pair chain: ops/pallas_dgt kernels A+B.

        Node-level math runs through the ordinary flax modules; pair-side
        modules are probe-instantiated on tiny slices so the param tree is
        identical to the XLA path (checkpoint/converter-compatible)."""
        from ..ops.pallas_dgt import fused_edge_equi, fused_pre_attention

        dt = self.dtype
        f32 = jnp.float32
        b, n = h.shape[0], h.shape[1]
        dist_dim = self.edge_dim if self.dist_gbf else 1
        e_ch = e_in.shape[-1]
        interpret = jax.default_backend() != "tpu"
        h_in = h

        sq = pairwise_sq_dist(pos)  # [B,N,N] f32

        # ---- per-graph modulation vectors (node-level) ----
        if self.cond_time:
            n_mod = nn.Dense(self.node_dim * 6, dtype=dt,
                             name="node_time_mlp")(nn.silu(node_time_emb))
            e_mod6 = nn.Dense(self.edge_dim * 6, dtype=dt,
                              name="edge_time_mlp")(nn.silu(edge_time_emb))
            (ns_msa, nsc_msa, ng_msa, ns_mlp, nsc_mlp, ng_mlp) = jnp.split(
                n_mod, 6, -1)
            (es_msa, esc_msa, eg_msa, es_mlp, esc_mlp, eg_mlp) = jnp.split(
                e_mod6, 6, -1)
            h_ln = modulate(layer_norm(h), ns_msa, nsc_msa)
            e_mod_a = jnp.concatenate([es_msa, esc_msa], -1)
            e_mod_b = jnp.concatenate([eg_msa, es_mlp, esc_mlp, eg_mlp], -1)
        else:
            h_ln = layer_norm(h)
            e_mod_a = jnp.zeros((b, 2 * self.edge_dim), dt)
            e_mod_b = jnp.zeros((b, 4 * self.edge_dim), dt)

        # ---- GBF params + per-graph distance time-modulation ----
        gbf_time = False
        if self.dist_gbf:
            dist_layer = GBF_LAYERS[self.gbf_name](dist_dim,
                                                   name="dist_layer")
            _ = dist_layer(sq[:, :1, :1, None], edge_time_emb)
            dl = dist_layer.variables["params"]
            means = dl["means"][None, :]
            stds = dl["stds"][None, :]
            if self.gbf_name == "CondGaussianLayer" and edge_time_emb is not None:
                gss = (nn.silu(edge_time_emb).astype(f32)
                       @ dl["Dense_0"]["kernel"] + dl["Dense_0"]["bias"])
                gbf_time = True
            else:
                gss = jnp.zeros((b, 2), f32)
        else:
            means = stds = jnp.zeros((1, 1), f32)
            gss = jnp.zeros((b, 2), f32)

        # ---- edge_emb Dense split into per-operand kernels ----
        edge_emb = nn.Dense(self.edge_dim, dtype=dt, name="edge_emb")
        _ = edge_emb(jnp.zeros((b, 1, 1, dist_dim + e_ch), dt))
        eek = edge_emb.variables["params"]["kernel"]
        eeb = edge_emb.variables["params"]["bias"][None, :]
        w_d0 = eek[0:1]
        w_dg = eek[1:dist_dim] if self.dist_gbf else jnp.zeros(
            (1, self.edge_dim), f32)
        w_ee = eek[dist_dim:]

        # ---- attention projections (node-level) ----
        attn = DenseTransMixLayer(
            node_dim=self.node_dim, heads=self.heads,
            extra_heads=self.extra_heads, softmax_inf=self.softmax_inf,
            dropout=self.dropout, dtype=dt, use_pallas=False, name="attn",
        )
        probe_extra = (jnp.zeros((b, 1, 1, self.extra_heads), dt)
                       if self.extra_heads > 0 else None)
        _ = attn(h_ln[:, :1], jnp.zeros((b, 1, 1, self.edge_dim), dt),
                 edge_mask[:, :1, :1], probe_extra, True)
        ap = attn.variables["params"]
        q = h_ln @ ap["lin_query"]["kernel"].astype(dt) \
            + ap["lin_query"]["bias"].astype(dt)
        k = h_ln @ ap["lin_key"]["kernel"].astype(dt) \
            + ap["lin_key"]["bias"].astype(dt)
        v = h_ln @ ap["lin_value"]["kernel"].astype(dt) \
            + ap["lin_value"]["bias"].astype(dt)

        extra = self.extra_heads
        out_ch = self.node_dim // self.heads
        sub_heads = self.heads - extra
        sub_ch = (self.heads * out_ch) // sub_heads
        extra_k = None
        if extra > 0 and extra_adj is not None:
            extra_k = extra_adj
            if extra_k.shape[-1] != extra:
                extra_k = jnp.repeat(extra_k, extra // extra_k.shape[-1],
                                     axis=-1)
            extra_k = extra_k.astype(dt)

        attn_out = fused_pre_attention(
            sq, e_in.astype(dt), extra_k, edge_mask, q, k, v,
            gss, e_mod_a, means, stds, w_d0, w_dg, w_ee, eeb,
            ap["lin_edge0_kernel"].astype(dt),
            ap["lin_edge1_kernel"].astype(dt),
            sub_heads=sub_heads, sub_ch=sub_ch, heads=self.heads,
            out_ch=out_ch, extra_heads=extra, softmax_inf=self.softmax_inf,
            dist_gbf=self.dist_gbf, gbf_time_mod=gbf_time,
            cond_time=self.cond_time, equivariant=True, interpret=interpret,
        )

        # ---- node stream (identical to the XLA path) ----
        y = nn.Dense(self.edge_dim, use_bias=False, dtype=dt,
                     name="node2edge_lin")(attn_out)
        n2e_bias = self.param(
            "node2edge_bias", nn.initializers.zeros, (self.edge_dim,)
        )
        nm = node_mask[..., None]
        if self.cond_time:
            h_node = h_in + modulate_gate(ng_msa, attn_out)
            h_node = modulate(layer_norm(h_node), ns_mlp, nsc_mlp) * nm
            h_out = (
                h_node
                + modulate_gate(
                    ng_mlp,
                    GatedFFN(self.node_dim, self.mlp_ratio, self.dropout,
                             dtype=dt, name="ff_node")(h_node, True),
                )
            ) * nm
        else:
            h_node = h_in + attn_out
            h_node = layer_norm(h_node) * nm
            h_out = (
                h_node
                + GatedFFN(self.node_dim, self.mlp_ratio, self.dropout,
                           dtype=dt, name="ff_node")(h_node, True)
            ) * nm

        # ---- pair-side module params for kernel B (probe calls) ----
        ffn_edge = GatedFFN(self.edge_dim, self.mlp_ratio, self.dropout,
                            dtype=dt, name="ff_edge")
        _ = ffn_edge(jnp.zeros((b, 1, 1, self.edge_dim), dt), True)
        ffp = ffn_edge.variables["params"]
        equi = EquivariantCoordUpdate(
            self.node_dim, self.extra_heads, dtype=dt,
            use_pallas=False, name="equi_update",
        )
        _ = equi(h_out[:, :1], pos[:, :1],
                 jnp.zeros((b, 1, 1, self.edge_dim), dt),
                 jnp.zeros((b, 1, 1, dist_dim), dt),
                 edge_mask[:, :1, :1], edge_time_emb,
                 extra_k[:, :1, :1] if extra_k is not None else None, True)
        eqp = equi.variables["params"]

        z_i = h_out @ eqp["input_lin_i"]["kernel"].astype(dt) \
            + eqp["input_lin_i"]["bias"].astype(dt)
        z_j = h_out @ eqp["input_lin_j"]["kernel"].astype(dt)

        if edge_time_emb is not None:
            ss = nn.silu(edge_time_emb) @ eqp["time_mlp"]["kernel"].astype(dt) \
                + eqp["time_mlp"]["bias"].astype(dt)
            eq_ss = ss  # shift ++ scale (time_mlp emits [B, 2*Hd])
        else:
            eq_ss = jnp.zeros((b, 2 * self.node_dim), dt)

        import os as _os
        if _os.environ.get("JODO_FUSE_B", "1") != "1":
            # ablation path: kernel A + the XLA post-attention chain
            if self.dist_gbf:
                dist_feat = dist_layer(sq[..., None], edge_time_emb)
            else:
                dist_feat = sq[..., None]
            h_edge = y[:, :, None, :] + y[:, None, :, :] \
                + n2e_bias.astype(dt)
            if self.cond_time:
                h_edge = e_in + modulate_gate(eg_msa, h_edge, pair=True)
                h_edge = modulate(layer_norm(h_edge), es_mlp, esc_mlp)
                e_out = h_edge + modulate_gate(
                    eg_mlp, ffn_edge(h_edge, True), pair=True)
            else:
                h_edge = e_in + h_edge
                h_edge = layer_norm(h_edge)
                e_out = h_edge + ffn_edge(h_edge, True)
            pos = equi(h_out, pos, e_out, dist_feat, edge_mask,
                       edge_time_emb, extra_k, True)
            return h_out, e_out, pos

        eq_wd = eqp["input_lin_d_kernel"]
        eq_wd0 = eq_wd[0:1]
        eq_wdg = eq_wd[1:] if self.dist_gbf else jnp.zeros(
            (1, self.node_dim), f32)

        e_out, w = fused_edge_equi(
            sq, e_in.astype(dt), extra_k, edge_mask, y, z_i, z_j,
            gss, e_mod_b, eq_ss,
            eqp["coord_norm_scale"][None, :],
            n2e_bias[None, :],
            ffp["Dense_0"]["kernel"].astype(dt),
            ffp["Dense_0"]["bias"][None, :],
            ffp["Dense_1"]["kernel"].astype(dt),
            ffp["Dense_1"]["bias"][None, :],
            means, stds,
            eqp["input_lin_e_kernel"].astype(dt), eq_wd0, eq_wdg,
            eqp["coord_mlp_0_kernel"].astype(dt),
            eqp["coord_mlp_0_bias"][None, :],
            eqp["coord_mlp_1_kernel"].astype(dt),
            n_gate_heads=(1 + extra if extra_k is not None else 1),
            dist_gbf=self.dist_gbf, gbf_time_mod=gbf_time,
            cond_time=self.cond_time, equivariant=True, interpret=interpret,
        )

        posf = pos.astype(f32)
        rowsum = jnp.sum(w, axis=2, keepdims=True)
        pos = pos + posf * rowsum - jnp.einsum("bij,bjc->bic", w, posf)
        return h_out, e_out, pos

    def _fused_edge_chain(self, y, n2e_bias, e_in, dist_feat, extra_adj,
                          edge_mask, h_out, pos, ffn_edge, equi, mods,
                          edge_time_emb, deterministic):
        from ..ops.pallas_edge_chain import fused_edge_chain

        b, n = e_in.shape[0], e_in.shape[1]
        dt = self.dtype

        # probe calls: instantiate ff_edge / equi_update params on tiny
        # slices (param shapes depend only on channel dims). The equi probe
        # must not engage its own pallas kernel on degenerate 1x1 tiles
        # (Mosaic may reject them), so probe with deterministic=False which
        # routes to the XLA branch.
        if self.extra_heads > 0:
            assert extra_adj is not None, (
                "fused edge chain requires extra_adj when extra_heads>0 "
                "(inline path averages all gate heads; fused uses head 0 "
                "plus extra_adj channels)")
        _ = ffn_edge(e_in[:, :1, :1, :], True)
        _ = equi(h_out[:, :1], pos[:, :1], e_in[:, :1, :1],
                 dist_feat[:, :1, :1], edge_mask[:, :1, :1], edge_time_emb,
                 extra_adj[:, :1, :1] if extra_adj is not None else None,
                 False)
        ffp = ffn_edge.variables["params"]
        eqp = equi.variables["params"]

        if mods is not None:
            eg_msa, es_mlp, esc_mlp, eg_mlp = mods
        else:
            eg_msa = eg_mlp = jnp.ones((b, self.edge_dim), dt)
            es_mlp = esc_mlp = jnp.zeros((b, self.edge_dim), dt)

        # equi input projections (node-level matmuls stay in XLA)
        z_i = h_out @ eqp["input_lin_i"]["kernel"].astype(dt) \
            + eqp["input_lin_i"]["bias"].astype(dt)
        z_j = h_out @ eqp["input_lin_j"]["kernel"].astype(dt)
        z = jnp.concatenate([z_i, z_j], axis=-1)

        if edge_time_emb is not None:
            ss = nn.silu(edge_time_emb) @ eqp["time_mlp"]["kernel"].astype(dt) \
                + eqp["time_mlp"]["bias"].astype(dt)
            equi_shift, equi_scale = jnp.split(ss, 2, axis=-1)
        else:
            equi_shift = jnp.zeros((b, self.node_dim), dt)
            equi_scale = jnp.zeros((b, self.node_dim), dt)

        if self.extra_heads > 0 and extra_adj is not None:
            extra = extra_adj
            if extra.shape[-1] != self.extra_heads:
                extra = jnp.repeat(extra, self.extra_heads // extra.shape[-1],
                                   axis=-1)
            n_gate_heads = 1 + self.extra_heads
        else:
            extra = jnp.zeros((b, n, n, 1), dt)
            n_gate_heads = 1

        posf = pos.astype(jnp.float32)
        diff = posf[:, :, None, :] - posf[:, None, :, :]
        r = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-16))

        interpret = jax.default_backend() != "tpu"
        e_out, w = fused_edge_chain(
            y, z, e_in.astype(dt), dist_feat.astype(dt), extra.astype(dt),
            edge_mask, r,
            eg_msa, es_mlp, esc_mlp, eg_mlp, equi_shift, equi_scale,
            n2e_bias.astype(dt),
            ffp["Dense_0"]["kernel"].astype(dt), ffp["Dense_0"]["bias"].astype(dt),
            ffp["Dense_1"]["kernel"].astype(dt), ffp["Dense_1"]["bias"].astype(dt),
            eqp["input_lin_e_kernel"].astype(dt), eqp["input_lin_d_kernel"].astype(dt),
            eqp["coord_mlp_0_kernel"].astype(dt), eqp["coord_mlp_0_bias"].astype(dt),
            eqp["coord_mlp_1_kernel"].astype(dt), eqp["coord_norm_scale"],
            n_gate_heads=n_gate_heads, interpret=interpret,
        )
        rowsum = jnp.sum(w, axis=2, keepdims=True)
        pos = pos + posf * rowsum - jnp.einsum("bij,bjc->bic", w, posf)
        return e_out, pos


def modulate_gate(gate, x, pair=False):
    """Per-graph gate [B,D] applied to node [B,N,D] or pair [B,N,N,D]."""
    g = gate[:, None, None, :] if pair else gate[:, None, :]
    return g * x


class DGT(nn.Module):
    """Joint 2D+3D Diffusion Graph Transformer (reference DGT_concat family).

    Set `equivariant=False` for the 2D variant, `extra_heads=0` for the
    `sim` variant, `cond_ch>0` for the property-conditional variant.
    """

    in_node_dim: int  # atom_types (+1 if formal charges)
    edge_ch: int
    hidden_dim: int = 256
    n_layers: int = 8
    heads: int = 16
    extra_heads: int = 2
    cond_time: bool = True
    dist_gbf: bool = True
    gbf_name: str = "CondGaussianLayer"
    softmax_inf: bool = True
    pred_data: bool = True
    com_each_layer: bool = True
    mlp_ratio: int = 2
    dropout: float = 0.0
    spatial_cut_off: float = 2.0
    edge_quan_th: float = 0.0
    equivariant: bool = True
    time_dim: int = 0  # 0 => hidden_dim * 4
    cond_ch: int = 0  # number of conditional properties
    compute_dtype: str = "float32"  # 'bfloat16' halves HBM traffic
    use_pallas: bool = False  # fused edge-attention kernel
    use_pallas_equi: bool = False  # fused equi-update gate kernel (see BASELINE.md)
    fold_equi_ln: bool = False  # LN fold: exact but slower (BASELINE.md r5)
    use_pallas_edge_chain: bool = False  # fused post-attn edge+equi kernel
    use_pallas_block: bool = False  # fully-fused pair chain (ops/pallas_dgt)
    remat_attn: bool = True  # recompute attention in bwd (see BASELINE.md r2)
    remat_ffn: bool = False  # recompute edge FFN + dropout masks in bwd

    @nn.compact
    def __call__(
        self,
        t,
        xh,
        node_mask,
        edge_mask,
        edge_x,
        noise_level,
        cond_x=None,
        cond_edge_x=None,
        cond_flag=0.0,
        context=None,
        deterministic=True,
    ):
        b, n = xh.shape[0], xh.shape[1]
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        edge_hidden = self.hidden_dim // 4
        time_dim = self.time_dim or self.hidden_dim * 4
        dist_dim = edge_hidden if self.dist_gbf else 1

        if cond_x is None:
            cond_x = jnp.zeros_like(xh)
        if cond_edge_x is None:
            cond_edge_x = jnp.zeros_like(edge_x)
        cond_flag = jnp.asarray(cond_flag, dtype=xh.dtype)

        if self.equivariant:
            pos = xh[:, :, :3]
            h = xh[:, :, 3:]
            cond_pos = cond_x[:, :, :3]
            cond_h = cond_x[:, :, 3:]
        else:
            pos = None
            h = xh
            cond_pos = None
            cond_h = cond_x

        # self-conditioning adjacency channel (mol_gnn.py:517-525):
        # ones when no self-cond prediction, thresholded edge-exist otherwise.
        cond_adj_2d = jnp.where(
            cond_flag > 0,
            (cond_edge_x[..., 0:1] >= self.edge_quan_th).astype(xh.dtype),
            jnp.ones_like(cond_edge_x[..., 0:1]),
        )

        # concat self-cond node features (the "_concat" in DGT_concat)
        h = jnp.concatenate([h, cond_h], axis=-1)

        # property context folded into the time embedding (mol_gnn.py:728-737)
        ctx_emb = None
        if self.cond_ch > 0 and context is not None:
            c = context[..., None]  # [B, P, 1]
            c = nn.Dense(self.hidden_dim, dtype=dt, name="cond_mlp_0")(c)
            c = nn.gelu(c)
            c = nn.Dense(self.hidden_dim, dtype=dt, name="cond_mlp_1")(c)
            ctx_emb = nn.Dense(time_dim, dtype=dt, name="cond_lin")(c.reshape(b, -1))

        if self.cond_time:
            time_emb = TimeMLP(time_dim, dtype=dt, name="time_mlp")(noise_level)
            if ctx_emb is not None:
                time_emb = time_emb + ctx_emb
            node_time_emb = time_emb
            edge_time_emb = time_emb
        else:
            node_time_emb = edge_time_emb = None

        if self.equivariant:
            # distances from the self-cond positions (mol_gnn.py:543-548);
            # all-zero distances (no self-cond yet) bypass the GBF expansion
            sq = pairwise_sq_dist(cond_pos)[..., None] * edge_mask[..., None]
            cond_adj_spatial = (
                (sq[..., 0] <= self.spatial_cut_off).astype(xh.dtype) * edge_mask
            )[..., None]
            all_zero = jnp.sum(sq) == 0.0
            if self.dist_gbf:
                gbf_feat = GBF_LAYERS[self.gbf_name](dist_dim, name="dist_layer")(
                    sq, edge_time_emb
                ).astype(dt)
            else:
                gbf_feat = sq.astype(dt)
            dist_feat = jnp.where(
                all_zero, jnp.zeros((b, n, n, dist_dim), dt), gbf_feat
            )
            extra_adj = jnp.concatenate([cond_adj_2d, cond_adj_spatial], axis=-1)
            edge_attr = jnp.concatenate([edge_x, cond_edge_x, dist_feat], axis=-1)
        else:
            extra_adj = cond_adj_2d
            edge_attr = jnp.concatenate([edge_x, cond_edge_x], axis=-1)

        if self.extra_heads == 0:
            extra_adj = None

        h = nn.Dense(self.hidden_dim, dtype=dt, name="node_emb")(h)
        edge_attr = nn.Dense(edge_hidden, dtype=dt, name="edge_emb")(edge_attr)

        cat_node_dim = (self.hidden_dim * 2) // self.n_layers
        cat_edge_dim = (edge_hidden * 2) // self.n_layers
        atom_hids = [h]
        edge_hids = [edge_attr]

        for i in range(self.n_layers):
            h, edge_attr, pos = DGTBlock(
                node_dim=self.hidden_dim,
                edge_dim=edge_hidden,
                heads=self.heads,
                extra_heads=self.extra_heads,
                cond_time=self.cond_time,
                dist_gbf=self.dist_gbf,
                softmax_inf=self.softmax_inf,
                equivariant=self.equivariant,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                gbf_name=self.gbf_name,
                dtype=dt,
                use_pallas=self.use_pallas,
                use_pallas_equi=self.use_pallas_equi,
                fold_equi_ln=self.fold_equi_ln,
                use_pallas_edge_chain=self.use_pallas_edge_chain,
                use_pallas_block=self.use_pallas_block,
                remat_attn=self.remat_attn,
                remat_ffn=self.remat_ffn,
                name=f"e_block_{i}",
            )(
                pos,
                h,
                edge_attr,
                node_mask,
                edge_mask,
                extra_adj,
                node_time_emb,
                edge_time_emb,
                deterministic,
            )
            if self.equivariant and self.com_each_layer:
                pos = remove_mean_with_mask(pos, node_mask)
            atom_hids.append(nn.Dense(cat_node_dim, dtype=dt, name=f"node_{i}")(h))
            # per-layer edge skip Dense: probe-instantiate only — the
            # [B,N,N,16] skip tensors and the 192-channel concat are folded
            # algebraically into the readout heads below (exact:
            # Dense(concat(x_i)) == sum_i x_i @ V_i), removing ~9 pair-tensor
            # materialisations per forward
            eh = nn.Dense(cat_edge_dim, dtype=dt, name=f"edge_{i}")
            _ = eh(edge_attr[:, :1, :1])
            edge_hids.append((eh.variables["params"], edge_attr))

        atom_cat = jnp.concatenate(atom_hids, axis=-1)

        atom_pred = _readout_mlp(
            atom_cat, self.hidden_dim, self.in_node_dim, dt, name="node_pred_mlp"
        ).astype(jnp.float32) * node_mask[..., None]
        edge_exist, edge_type = self._folded_edge_readout(
            edge_hids, edge_hidden, dt
        )
        edge_pred = jnp.concatenate([edge_exist, edge_type], axis=-1).astype(jnp.float32)
        edge_pred = edge_pred * edge_mask[..., None]
        edge_pred = 0.5 * (edge_pred + jnp.swapaxes(edge_pred, 1, 2))

        if not self.equivariant:
            return atom_pred, edge_pred

        nm = node_mask[..., None]
        if self.pred_data:
            pos = pos * nm
        else:
            pos = (pos - xh[:, :, :3]) * nm
        # NaN guard (mol_gnn.py:587-589): zero the positions if non-finite
        finite = jnp.all(jnp.isfinite(pos))
        pos = jnp.where(finite, pos, jnp.zeros_like(pos))
        pos = remove_mean_with_mask(pos, node_mask)
        return jnp.concatenate([pos, atom_pred], axis=2), edge_pred

    def _folded_edge_readout(self, edge_hids, edge_hidden, dt):
        """Skip-concat edge readout with the concat folded away.

        The reference computes Dense_0(concat([e_embed] + [Dense_i(e_i)]))
        for the edge-exist and edge-type heads (mol_gnn.py:459-479,571-574).
        Algebraically Dense_0(concat(x_i)) = sum_i x_i @ V_i, and
        (e_i @ W_i) @ V_i = e_i @ (W_i V_i), so the first readout layer of
        BOTH heads collapses into one [64->128] matmul per layer stream —
        no [B,N,N,16] skips, no [B,N,N,192] concat. Param tree unchanged.
        edge_hids: [raw_embed_stream, (dense_params, stream), ...].
        """
        b = edge_hids[0].shape[0]
        f32 = jnp.float32
        cat_edge_dim = edge_hids[0].shape[-1] + sum(
            p["kernel"].shape[1] for p, _ in edge_hids[1:]
        )
        probe = jnp.zeros((b, 1, 1, cat_edge_dim), dt)
        d_exist = nn.Dense(edge_hidden, dtype=dt, name="edge_exist_mlp_0")
        _ = d_exist(probe)
        d_type = nn.Dense(edge_hidden, dtype=dt, name="edge_type_mlp_0")
        _ = d_type(probe)
        ve = d_exist.variables["params"]
        vt = d_type.variables["params"]
        v_both = jnp.concatenate(
            [ve["kernel"].astype(f32), vt["kernel"].astype(f32)], axis=1
        )  # [cat_edge_dim, 2*Eh]
        bias = jnp.concatenate(
            [ve["bias"].astype(f32), vt["bias"].astype(f32)]
        )  # [2*Eh]

        e0 = edge_hids[0]
        width = e0.shape[-1]
        acc = e0 @ v_both[:width].astype(dt)
        off = width
        for params, stream in edge_hids[1:]:
            per = params["kernel"].shape[1]
            m = params["kernel"].astype(f32) @ v_both[off:off + per]
            bias = bias + params["bias"].astype(f32) @ v_both[off:off + per]
            acc = acc + stream @ m.astype(dt)
            off += per
        acc = acc + bias.astype(dt)

        def tail(x, out_dim, name):
            y = _silu(x)
            y = nn.Dense(edge_hidden // 2, dtype=dt, name=f"{name}_1")(y)
            y = _silu(y)
            return nn.Dense(out_dim, dtype=dt, name=f"{name}_2")(y)

        eh = edge_hidden
        return (tail(acc[..., :eh], 1, "edge_exist_mlp"),
                tail(acc[..., eh:], self.edge_ch - 1, "edge_type_mlp"))


def _readout_mlp(x, hidden, out_dim, dtype, name):
    """Skip-concat readout head (mol_gnn.py:459-479)."""
    y = nn.Dense(hidden, dtype=dtype, name=f"{name}_0")(x)
    y = nn.silu(y)
    y = nn.Dense(hidden // 2, dtype=dtype, name=f"{name}_1")(y)
    y = nn.silu(y)
    return nn.Dense(out_dim, dtype=dtype, name=f"{name}_2")(y)
