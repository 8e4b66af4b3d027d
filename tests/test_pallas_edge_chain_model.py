"""Fused edge-chain path inside the full DGT forward: identical param tree
and numerically equal outputs vs the inline path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.models.dgt import DGT


def _inputs(b=2, n=16, feat=9, seed=0):
    rng = np.random.default_rng(seed)
    t = jnp.full((b,), 0.5)
    xh = jnp.asarray(rng.normal(0, 1, (b, n, feat)), jnp.float32)
    nm = jnp.ones((b, n)).at[0, -3:].set(0.0)
    em = (nm[:, :, None] * nm[:, None, :]) * (1 - jnp.eye(n))
    ex = jnp.asarray(rng.normal(0, 1, (b, n, n, 2)), jnp.float32)
    ex = 0.5 * (ex + jnp.swapaxes(ex, 1, 2))
    nl = jnp.full((b,), 0.3)
    return t, xh, nm, em, ex, nl


@pytest.mark.parametrize("extra_heads,cond_time", [(2, True), (0, True),
                                                   (2, False)])
def test_fused_edge_chain_model_equivalence(extra_heads, cond_time):
    kw = dict(in_node_dim=6, edge_ch=2, hidden_dim=64, n_layers=2, heads=8,
              extra_heads=extra_heads, cond_time=cond_time,
              compute_dtype="float32")
    m_inline = DGT(**kw)
    m_fused = DGT(**kw, use_pallas_edge_chain=True)
    args = _inputs()

    params = m_inline.init(jax.random.PRNGKey(0), *args)
    p2 = m_fused.init(jax.random.PRNGKey(0), *args)
    eq = jax.tree.map(lambda a, b: bool((a == b).all()), params, p2)
    assert all(jax.tree.leaves(eq)), "param trees differ between paths"

    o1, e1 = m_inline.apply(params, *args, deterministic=True)
    o2, e2 = m_fused.apply(params, *args, deterministic=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               atol=5e-4, rtol=1e-3)


def test_fused_flag_ignored_in_training_mode():
    """Non-deterministic (training) calls keep the autodiff inline path —
    gradients exist and match the inline model's."""
    kw = dict(in_node_dim=6, edge_ch=2, hidden_dim=32, n_layers=1, heads=4,
              extra_heads=0, compute_dtype="float32", dropout=0.0)
    m_fused = DGT(**kw, use_pallas_edge_chain=True)
    m_inline = DGT(**kw)
    args = _inputs(n=8)
    params = m_inline.init(jax.random.PRNGKey(0), *args)

    def loss(m):
        def f(p):
            o, e = m.apply(p, *args, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(o ** 2) + jnp.sum(e ** 2)
        return f

    g1 = jax.grad(loss(m_inline))(params)
    g2 = jax.grad(loss(m_fused))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
