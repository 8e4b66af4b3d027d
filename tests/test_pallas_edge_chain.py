"""Fused edge-chain kernel vs the inline DGTBlock math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.ops.pallas_edge_chain import fused_edge_chain


def _ref_edge_chain(y, z, e_in, d, extra, mask, r,
                    eg_msa, es_mlp, esc_mlp, eg_mlp, sh, sc,
                    n2e_b, ff1_w, ff1_b, ff2_w, ff2_b,
                    w_e, w_d, w_c0, b_c0, w_c1, cn_scale, n_gate_heads):
    """Straight jnp re-statement of DGTBlock's post-attention edge path +
    EquivariantCoordUpdate gate chain (models/dgt.py)."""

    def ln(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return (xf - mean) * jax.lax.rsqrt(var + 1e-6)

    def mod(x, shift, scale):
        return x * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]

    h_edge = y[:, :, None, :] + y[:, None, :, :] + n2e_b
    e1 = e_in + eg_msa[:, None, None, :] * h_edge
    e1n = mod(ln(e1), es_mlp, esc_mlp)
    mid = jax.nn.silu(e1n @ ff1_w + ff1_b)
    ff = mid @ ff2_w + ff2_b
    e_out = e1n + eg_mlp[:, None, None, :] * ff

    hd = w_c0.shape[0]
    z_i, z_j = z[..., :hd], z[..., hd:]
    t = z_i[:, :, None, :] + z_j[:, None, :, :] + e_out @ w_e + d @ w_d
    t = mod(ln(t), sh, sc)
    g = jax.nn.silu(t @ w_c0 + b_c0)
    inv = jnp.tanh(g @ w_c1)
    ones = jnp.ones_like(inv[..., :1])
    adjs = jnp.concatenate([ones, extra], -1) if n_gate_heads > 1 else ones
    inv = jnp.sum(inv * adjs, -1) / n_gate_heads
    w = inv * mask * (cn_scale[0] / r)
    return e_out, w


@pytest.mark.parametrize("extra_heads", [0, 2])
def test_fused_edge_chain_matches_reference(extra_heads):
    rng = np.random.default_rng(0)
    b, n, e_dim, hd = 2, 16, 32, 64
    n_gate_heads = 1 + extra_heads

    def f(*shape, scale=1.0):
        return jnp.asarray(rng.normal(0, scale, shape), jnp.float32)

    y = f(b, n, e_dim)
    z = f(b, n, 2 * hd)
    e_in = f(b, n, n, e_dim)
    d = f(b, n, n, e_dim)
    extra = jnp.asarray(rng.integers(0, 2, (b, n, n, max(extra_heads, 1))),
                        jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (b, n, n)), jnp.float32)
    r = jnp.abs(f(b, n, n)) + 0.5
    eg_msa, es_mlp, esc_mlp, eg_mlp = (f(b, e_dim) for _ in range(4))
    sh, sc = f(b, hd), f(b, hd)
    n2e_b = f(e_dim)
    ff1_w, ff1_b = f(e_dim, 2 * e_dim, scale=0.2), f(2 * e_dim)
    ff2_w, ff2_b = f(2 * e_dim, e_dim, scale=0.2), f(e_dim)
    w_e, w_d = f(e_dim, hd, scale=0.2), f(e_dim, hd, scale=0.2)
    w_c0, b_c0 = f(hd, hd, scale=0.2), f(hd)
    w_c1 = f(hd, n_gate_heads, scale=0.2)
    cn_scale = jnp.full((1,), 1e-2, jnp.float32)

    args = (y, z, e_in, d, extra, mask, r, eg_msa, es_mlp, esc_mlp, eg_mlp,
            sh, sc, n2e_b, ff1_w, ff1_b, ff2_w, ff2_b, w_e, w_d, w_c0, b_c0,
            w_c1, cn_scale)

    interpret = jax.default_backend() != "tpu"
    e_k, w_k = fused_edge_chain(*args, n_gate_heads=n_gate_heads,
                                tile_i=8, interpret=interpret)
    e_r, w_r = _ref_edge_chain(*args, n_gate_heads=n_gate_heads)

    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_r),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r),
                               atol=2e-5, rtol=2e-3)
