"""Dense TPU-native layers for the Diffusion Graph Transformer.

The reference expresses attention as PyG sparse message passing over a
fully-connected masked graph (models/layers.py:13-270). On TPU the idiomatic
formulation is dense batched [B,N,N] tensors: the edge-feature projections
become [B*N*N, C] matmuls on the MXU and the softmax is a masked dense
softmax — no gathers, no segment ops, no dense<->sparse conversion.

Semantics preserved from the reference:
  * per-head logits  (q_i . k_j . tanh(W0 e_ij)) / sqrt(C)
    (models/layers.py:72-74,165-167)
  * `extra` attention heads whose logits are adjacency-channel values,
    optionally -1e10-masked where the channel is 0 (models/layers.py:169-176)
  * value messages gated by tanh(W1 e_ij) (models/layers.py:80-82,181-184)
  * learned-sinusoidal time embedding (models/layers.py:273-288)
  * Gaussian-basis distance expansion with optional time modulation
    (models/layers.py:291-334)
  * CoorsNorm with small initial scale (models/layers.py:337-347)

Convention: pair tensors are indexed [B, i, j, ...]; attention output at
node i reduces over neighbours j; edge features are symmetric throughout.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attn_vjp import edge_attention

NEG_MASK = -1e30  # non-edges (lower than the extra-head -1e10 sentinel)
NEG_EXTRA = -1e10

import os as _env


def _flat_pair_dots() -> bool:
    """JODO_FLAT_PAIR_DOTS=1: run pair-tensor ([B,N,N,C]) Denses as
    flattened 2D dots. Rank-4 dots can make XLA pick batch-minor layouts
    whose outputs then need {0,3,2,1}->{3,2,1,0} copies (~1 ms/step traced
    at QM9 sampling scale) before the Pallas attention custom call; 2D
    dots keep the default row-major layout. Numerics identical."""
    return _env.environ.get("JODO_FLAT_PAIR_DOTS", "0") == "1"


def _pair_dense(dense, x):
    """Apply a Dense to a pair tensor, optionally via a flattened 2D dot
    (same params / same values either way)."""
    if x.ndim == 4 and _flat_pair_dots():
        b, n1, n2, c = x.shape
        y = dense(x.reshape(b * n1 * n2, c))
        return y.reshape(b, n1, n2, y.shape[-1])
    return dense(x)


class LearnedSinusoidalEmb(nn.Module):
    """x [B] -> [B, dim+1]: (x, sin(2pi w x), cos(2pi w x))."""

    dim: int = 16

    @nn.compact
    def __call__(self, x):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        x = x[:, None]
        freqs = x * w[None, :] * 2.0 * math.pi
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimeMLP(nn.Module):
    """noise_level [B] -> time embedding [B, time_dim] (mol_gnn.py:481-489)."""

    time_dim: int
    learned_dim: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, noise_level):
        x = LearnedSinusoidalEmb(self.learned_dim)(noise_level)
        x = nn.Dense(self.time_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.time_dim, dtype=self.dtype)(x)


def _gaussian_basis(x, mean, std):
    a = (2 * 3.14159) ** 0.5
    return jnp.exp(-0.5 * (((x - mean) / std) ** 2)) / (a * std)


class GaussianLayer(nn.Module):
    """Distance -> K features: raw value ++ K-1 Gaussian basis responses."""

    k: int

    @nn.compact
    def __call__(self, x, time_emb=None):
        del time_emb
        means = self.param("means", nn.initializers.uniform(3.0), (self.k - 1,))
        stds = self.param("stds", nn.initializers.uniform(3.0), (self.k - 1,))
        std = jnp.abs(stds) + 1e-5
        return jnp.concatenate([x, _gaussian_basis(x, means, std)], axis=-1)


class CondGaussianLayer(nn.Module):
    """GaussianLayer with per-graph time scale/shift of the input distance."""

    k: int

    @nn.compact
    def __call__(self, x, time_emb=None):
        # x: [B, N, N, 1]; time_emb: [B, T]
        if time_emb is not None:
            ss = nn.Dense(2)(nn.silu(time_emb))  # [B, 2]
            scale, shift = ss[:, :1], ss[:, 1:]
            x = x * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]
        means = self.param("means", nn.initializers.uniform(3.0), (self.k - 1,))
        stds = self.param("stds", nn.initializers.uniform(3.0), (self.k - 1,))
        std = jnp.abs(stds) + 1e-5
        return jnp.concatenate([x, _gaussian_basis(x, means, std)], axis=-1)


GBF_LAYERS = {"GaussianLayer": GaussianLayer, "CondGaussianLayer": CondGaussianLayer}


class CoorsNorm(nn.Module):
    """Normalise coordinate differences to unit length * learned scale.

    Gradient-safe at exactly-zero vectors (the dense formulation feeds the
    i==i diagonal pairs through here; sqrt'(0) would poison the backward
    pass even though the forward is masked out downstream)."""

    eps: float = 1e-8
    scale_init: float = 1e-2

    @nn.compact
    def __call__(self, coors):
        scale = self.param(
            "scale", lambda *_: jnp.full((1,), self.scale_init, jnp.float32)
        )
        norm_sq = jnp.sum(coors * coors, axis=-1, keepdims=True)
        norm = jnp.sqrt(jnp.maximum(norm_sq, self.eps * self.eps))
        return coors / norm * scale


def masked_pair_softmax(logits, edge_mask):
    """Softmax over the last axis (neighbours j) restricted to real edges.

    logits [B, H, N, N]; edge_mask [B, N, N]. Fully-masked rows yield 0.
    """
    mask = edge_mask[:, None, :, :]
    logits = jnp.where(mask > 0, logits, NEG_MASK)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    unnorm = jnp.exp(logits) * mask
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-20)


class DenseTransMixLayer(nn.Module):
    """Edge-biased multi-head attention with extra adjacency-logit heads.

    Dense re-design of TransMixLayer (models/layers.py:92-191); with
    extra_heads == 0 it degenerates to Trans_Layer (models/layers.py:13-89).
    Matmuls/elementwise run in `dtype` (bf16 halves the HBM traffic of the
    [B,N,N,C] tensors); logits/softmax accumulate in f32.
    """

    node_dim: int
    heads: int
    extra_heads: int = 0
    softmax_inf: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, edge_attr, edge_mask, extra_adj=None, deterministic=True):
        """h [B,N,D], edge_attr [B,N,N,Ed] (symmetric), edge_mask [B,N,N],
        extra_adj [B,N,N,X] adjacency channels (X <= extra_heads, expanded by
        repetition as in models/layers.py:140-144)."""
        d, heads, extra = self.node_dim, self.heads, self.extra_heads
        out_ch = d // heads
        sub_heads = heads - extra
        sub_ch = (heads * out_ch) // sub_heads

        b, n = h.shape[0], h.shape[1]
        dt = self.dtype
        q = nn.Dense(sub_heads * sub_ch, dtype=dt, name="lin_query")(h)
        k = nn.Dense(sub_heads * sub_ch, dtype=dt, name="lin_key")(h)
        v = nn.Dense(heads * out_ch, dtype=dt, name="lin_value")(h)

        # edge-gate projections as raw kernels so the fused Pallas path can
        # run them on-chip without materialising the gates to HBM
        kernel_init = nn.initializers.lecun_normal()
        w0 = self.param(
            "lin_edge0_kernel", kernel_init,
            (edge_attr.shape[-1], sub_heads * sub_ch),
        )
        w1 = self.param(
            "lin_edge1_kernel", kernel_init,
            (edge_attr.shape[-1], heads * out_ch),
        )

        if extra > 0:
            assert extra_adj is not None
            x_ch = extra_adj.shape[-1]
            if x_ch != extra:
                extra_adj = jnp.repeat(extra_adj, extra // x_ch, axis=-1)

        # Two attention cores (r2 BASELINE.md measurements at QM9 scale):
        #  * deterministic + use_pallas: ops/attn_vjp.py custom-VJP wrapper
        #    with the Pallas fused forward (sampling / EMA eval)
        #  * otherwise: inline jnp math under XLA autodiff; the DGTBlock
        #    wraps this module in nn.remat so the backward recomputes the
        #    [B,N,N,~256] tanh gates instead of saving them (15.4 vs
        #    ~116 ms/step without remat at QM9 train scale)
        has_dropout = self.dropout > 0.0 and not deterministic
        # pallas path engages for deterministic calls (sampling / EMA eval);
        # training keeps the inline autodiff core (faster in-chain, above)
        if self.use_pallas and deterministic:
            if has_dropout:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.dropout,
                    (b, heads, n, n),
                )
                drop_mask = keep.astype(dt) / (1.0 - self.dropout)
            else:
                drop_mask = jnp.ones((1, 1, 1, 1), dt)
            extra_in = (
                extra_adj.astype(dt) if extra > 0
                else jnp.zeros((b, n, n, 1), dt)
            )
            return edge_attention(
                q, k, v, edge_attr.astype(dt), extra_in, edge_mask,
                w0.astype(dt), w1.astype(dt), drop_mask,
                sub_heads, sub_ch, heads, out_ch, extra,
                self.softmax_inf, True, has_dropout,
            )

        q = q.reshape(b, n, sub_heads, sub_ch)
        k = k.reshape(b, n, sub_heads, sub_ch)
        v = v.reshape(b, n, heads, out_ch)
        # knob-aware gates (JODO_ATTN_TANH, trace-time) so this inline
        # training core matches the Pallas/VJP paths under any knob
        from ..ops.transcendental import attn_tanh

        ea = attn_tanh(edge_attr.astype(dt) @ w0.astype(dt))
        ea = ea.reshape(b, n, n, sub_heads, sub_ch)
        ev = attn_tanh(edge_attr.astype(dt) @ w1.astype(dt))
        ev = ev.reshape(b, n, n, heads, out_ch)

        # logits over neighbours j for target i (f32 accumulation)
        logits = jnp.einsum(
            "bihc,bjhc,bijhc->bhij", q, k, ea,
            preferred_element_type=jnp.float32,
        ) / math.sqrt(out_ch)

        if extra > 0:
            extra_logits = jnp.moveaxis(
                extra_adj.astype(jnp.float32), -1, 1
            )  # [B, extra, N, N]
            if self.softmax_inf:
                extra_logits = jnp.where(extra_logits == 0.0, NEG_EXTRA, extra_logits)
            # extra heads come first (models/layers.py:174-176)
            logits = jnp.concatenate([extra_logits, logits], axis=1)

        alpha = masked_pair_softmax(logits, edge_mask)  # [B, H, N, N]
        if has_dropout:
            alpha = nn.Dropout(self.dropout)(alpha, deterministic=False)

        out = jnp.einsum(
            "bhij,bjhc,bijhc->bihc", alpha.astype(self.dtype), v, ev,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return out.reshape(b, n, heads * out_ch)


def _silu(x):
    """silu for the per-pair gate/FFN tensors (the XLA-side share of the
    ~780M transcendentals/step; see BASELINE.md r3 floor analysis).

    JODO_SILU=pade (read at TRACE time — set before the first compile)
    evaluates the logistic through the shared clamped Pade(5/4) rational
    (ops/transcendental.pade_sigmoid): sigmoid max |err| <= 7e-4; the
    resulting silu has max ABSOLUTE err ~5e-3 near |x|~7.3 but relative
    err <= ~7e-4, under one bf16 rounding of the result. Pure VPU
    multiply-add (+one divide). A/B knob; exact nn.silu by default."""
    if _env.environ.get("JODO_SILU") == "pade":
        from ..ops.transcendental import pade_sigmoid

        return x * pade_sigmoid(x)
    return nn.silu(x)


class GatedFFN(nn.Module):
    """Two-layer FFN with dropout (the _ff_block of the reference blocks)."""

    dim: int
    mlp_ratio: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        # pair tensors optionally flow through flattened 2D dots (layout
        # control; see _flat_pair_dots). Only when dropout is inert so the
        # rng/broadcast shape semantics are untouched.
        flat = (
            x.ndim == 4
            and (deterministic or self.dropout == 0.0)
            and _flat_pair_dots()
        )
        shape = x.shape
        if flat:
            x = x.reshape(-1, shape[-1])
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(x)
        y = _silu(y)  # pair FFNs are a transcendental hot spot
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        if flat:
            y = y.reshape(shape[:-1] + (self.dim,))
        return y


def modulate(x, shift, scale):
    """adaLN modulation x*(1+scale)+shift (mol_gnn.py:12-13); shift/scale
    are per-graph [B, D] broadcast over nodes/edges."""
    extra_dims = x.ndim - 2
    for _ in range(extra_dims):
        shift = shift[:, None]
        scale = scale[:, None]
    return x * (1.0 + scale) + shift


def layer_norm(x):
    """Affine-free LayerNorm, eps 1e-6 (matching nn.LayerNorm(...,
    elementwise_affine=False, eps=1e-6) in the reference blocks).
    Statistics in f32 regardless of the stream dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
