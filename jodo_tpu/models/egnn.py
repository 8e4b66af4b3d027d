"""E(3)-equivariant GNN property regressor, dense TPU-native.

Re-design of the frozen EGNN classifier the reference uses to score
conditional generation (cond_gen/model.py:26-228). The sparse
fully-connected message passing becomes dense [B,N,N] tensors; the
forward is jit-compiled once per shape.

Note: the reference's masked variant (E_GCL_mask) does NOT update
coordinates (cond_gen/model.py:206-219 — coord_model call commented out);
we reproduce that: coordinates only feed the radial edge feature.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.features import pairwise_sq_dist

# torch.nn.Linear kernel init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)), i.e.
# variance (1/3)/fan_in — 1.73x smaller per layer than flax's LeCun
# normal. Over this model's ~17 matmuls the difference compounds to ~1e4
# in init-time activation scale, which made fresh (auto-trained)
# classifiers unstable; imported reference weights are unaffected.
_torch_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _dense(feat, name, use_bias=True, zeros=False):
    return nn.Dense(
        feat, name=name, use_bias=use_bias,
        kernel_init=nn.initializers.zeros if zeros else _torch_init,
    )


class EGCLMask(nn.Module):
    hidden_nf: int
    node_attr: bool = True

    @nn.compact
    def __call__(self, h, pos, node_mask, edge_mask, h0=None):
        b, n, d = h.shape
        radial = pairwise_sq_dist(pos)[..., None]  # [B,N,N,1]
        # Dense([h_i, h_j, r_ij]) split into per-node matmuls (same affine
        # map, O(N) instead of O(N^2) matmul rows)
        y_i = _dense(self.hidden_nf, "edge_mlp_0_i")(h)
        y_j = _dense(self.hidden_nf, "edge_mlp_0_j", use_bias=False)(h)
        y_r = _dense(self.hidden_nf, "edge_mlp_0_r", use_bias=False)(radial)
        m = y_i[:, :, None, :] + y_j[:, None, :, :] + y_r
        m = nn.silu(m)
        m = _dense(self.hidden_nf, "edge_mlp_1")(m)
        m = nn.silu(m)
        m = m * edge_mask[..., None]

        agg = jnp.sum(m, axis=2)  # aggregate messages at i
        if self.node_attr and h0 is not None:
            node_in = jnp.concatenate([h, agg, h0], axis=-1)
        else:
            node_in = jnp.concatenate([h, agg], axis=-1)
        out = _dense(self.hidden_nf, "node_mlp_0")(node_in)
        out = nn.silu(out)
        out = _dense(self.hidden_nf, "node_mlp_1")(out)
        return h + out  # recurrent residual


class EGNNRegressor(nn.Module):
    """Graph-level scalar property prediction from (one_hot, positions)."""

    in_node_nf: int = 5
    hidden_nf: int = 128
    n_layers: int = 7
    node_attr: bool = True

    @nn.compact
    def __call__(self, one_hot, pos, node_mask, edge_mask):
        nm = node_mask[..., None]
        h = _dense(self.hidden_nf, "embedding")(one_hot)
        for i in range(self.n_layers):
            h = EGCLMask(self.hidden_nf, self.node_attr, name=f"gcl_{i}")(
                h, pos, node_mask, edge_mask, h0=one_hot
            )
        h = _dense(self.hidden_nf, "node_dec_0")(h)
        h = nn.silu(h)
        h = _dense(self.hidden_nf, "node_dec_1")(h)
        h = h * nm
        g = jnp.sum(h, axis=1)
        g = _dense(self.hidden_nf, "graph_dec_0")(g)
        g = nn.silu(g)
        # zero-init head: the sum-over-nodes readout gives the graph vector
        # a large dynamic range at init, which costs the auto-trained
        # classifier (cond eval) >1k steps of scale recovery. Init-only —
        # imported reference weights overwrite it, so torch-ckpt parity is
        # unaffected.
        g = _dense(1, "graph_dec_1", zeros=True)(g)
        return g[:, 0]
