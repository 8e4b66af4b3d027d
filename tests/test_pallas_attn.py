"""Fused Pallas attention: numeric parity with the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.models.layers import DenseTransMixLayer
from jodo_tpu.ops import masks_from_counts

B, N, D = 3, 16, 64


@pytest.mark.parametrize("extra_heads,softmax_inf", [(0, True), (2, True), (2, False)])
def test_fused_matches_jnp(extra_heads, softmax_inf):
    heads = 8
    layer_ref = DenseTransMixLayer(
        node_dim=D, heads=heads, extra_heads=extra_heads,
        softmax_inf=softmax_inf, use_pallas=False,
    )
    layer_fused = DenseTransMixLayer(
        node_dim=D, heads=heads, extra_heads=extra_heads,
        softmax_inf=softmax_inf, use_pallas=True,
    )
    nm, em = masks_from_counts(jnp.asarray([10, 16, 5]), N)
    h = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    e = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 32))
    e = 0.5 * (e + jnp.swapaxes(e, 1, 2))
    extra = None
    if extra_heads:
        extra = (jax.random.uniform(jax.random.PRNGKey(2), (B, N, N, extra_heads))
                 > 0.5).astype(jnp.float32)
        extra = extra * em[..., None]

    params = layer_ref.init(jax.random.PRNGKey(3), h, e, em, extra)
    out_ref = layer_ref.apply(params, h, e, em, extra)
    out_fused = layer_fused.apply(params, h, e, em, extra)
    assert out_fused.shape == out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


def test_fused_tile_sizes():
    heads = 4
    layer = DenseTransMixLayer(node_dim=32, heads=heads, extra_heads=0,
                               use_pallas=True)
    layer_ref = DenseTransMixLayer(node_dim=32, heads=heads, extra_heads=0,
                                   use_pallas=False)
    nm, em = masks_from_counts(jnp.asarray([7, 12]), 12)  # N not % 16
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 32))
    e = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 8))
    params = layer.init(jax.random.PRNGKey(3), h, e, em)
    np.testing.assert_allclose(
        np.asarray(layer.apply(params, h, e, em)),
        np.asarray(layer_ref.apply(params, h, e, em)),
        atol=2e-5, rtol=2e-5,
    )


def test_tanh_pade_knob(monkeypatch):
    """JODO_ATTN_TANH=pade: the clamped Pade(5/4) rational stays within
    one bf16 rounding of true tanh pointwise, and the fused layer output
    stays within bf16-stream tolerance of the exact-tanh kernel."""
    monkeypatch.setenv("JODO_ATTN_TANH", "pade")
    from jodo_tpu.ops.pallas_attn import _tanh

    x = jnp.linspace(-10.0, 10.0, 4001)
    assert float(jnp.max(jnp.abs(_tanh(x) - jnp.tanh(x)))) < 4e-3

    heads = 8
    layer = DenseTransMixLayer(node_dim=D, heads=heads, extra_heads=2,
                               softmax_inf=True, use_pallas=True)
    nm, em = masks_from_counts(jnp.asarray([10, 16, 5]), N)
    h = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    e = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 32))
    e = 0.5 * (e + jnp.swapaxes(e, 1, 2))
    extra = (jax.random.uniform(jax.random.PRNGKey(2), (B, N, N, 2))
             > 0.5).astype(jnp.float32) * em[..., None]
    params = layer.init(jax.random.PRNGKey(3), h, e, em, extra)
    out_pade = layer.apply(params, h, e, em, extra)
    monkeypatch.delenv("JODO_ATTN_TANH")
    out_exact = layer.apply(params, h, e, em, extra)
    np.testing.assert_allclose(
        np.asarray(out_pade), np.asarray(out_exact), atol=2e-2, rtol=2e-2
    )


def test_silu_pade_knob(monkeypatch):
    """JODO_SILU=pade stays within one bf16 rounding of exact silu."""
    from jodo_tpu.models.layers import _silu

    x = jnp.linspace(-12.0, 12.0, 4001)
    exact = x * jax.nn.sigmoid(x)
    monkeypatch.setenv("JODO_SILU", "pade")
    # relative-to-|x| error: silu ~ x at +inf, so compare sigmoids
    assert float(jnp.max(jnp.abs(_silu(x) - exact) /
                         jnp.maximum(jnp.abs(x), 1.0))) < 1e-3


def test_knob_path_independence(monkeypatch):
    """ADVICE r3 #1: under any JODO_ATTN_TANH knob the fused-Pallas and
    jnp-fallback forwards agree to dispatch-path tolerance — the knob is
    routed through the single ops/transcendental.attn_tanh used by every
    path (Pallas forward, jnp fallback, custom-VJP backward recompute)."""
    heads = 8
    nm, em = masks_from_counts(jnp.asarray([10, 16, 5]), N)
    h = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    e = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 32))
    e = 0.5 * (e + jnp.swapaxes(e, 1, 2))
    layer_f = DenseTransMixLayer(node_dim=D, heads=heads, extra_heads=0,
                                 use_pallas=True)
    layer_j = DenseTransMixLayer(node_dim=D, heads=heads, extra_heads=0,
                                 use_pallas=False)
    params = layer_f.init(jax.random.PRNGKey(3), h, e, em)
    for mode in ("pade", "exp"):
        monkeypatch.setenv("JODO_ATTN_TANH", mode)
        np.testing.assert_allclose(
            np.asarray(layer_f.apply(params, h, e, em)),
            np.asarray(layer_j.apply(params, h, e, em)),
            atol=1e-4, rtol=1e-4,
        )
