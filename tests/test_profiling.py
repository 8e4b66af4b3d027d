"""FLOPs model + MFU utilities."""

import jax
import jax.numpy as jnp
import pytest

from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model
from jodo_tpu.profiling import device_peak_flops, dgt_forward_flops, mfu


def _xla_flops(cfg, b, n, feat, edge_ch):
    model = create_model(cfg)
    nm = jnp.ones((b, n))
    em = jnp.ones((b, n, n))
    args = (
        jnp.full((b,), 0.5), jnp.zeros((b, n, feat)), nm, em,
        jnp.zeros((b, n, n, edge_ch)), jnp.zeros((b,)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    fn = jax.jit(lambda p, *a: model.apply(p, *a))
    ca = fn.lower(params, *args).compile().cost_analysis()
    if not isinstance(ca, dict):
        ca = ca[0]
    return float(ca["flops"])


def test_dgt_flops_matches_xla_cost_analysis():
    """Analytic matmul FLOPs within 15% of XLA's compiled count (XLA also
    counts elementwise ops, so it sits slightly above the analytic value)."""
    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 64
    cfg.model.n_layers = 2
    cfg.model.n_heads = 8
    cfg.model.dropout = 0.0
    cfg.tpu.use_pallas = False
    cfg.tpu.compute_dtype = "float32"  # XLA's flop count is dtype-sensitive
    b, n = 4, 16
    xla = _xla_flops(cfg, b, n, 9, cfg.model.edge_ch)
    mine = dgt_forward_flops(cfg, b, n)
    assert 0.85 < xla / mine < 1.2, (xla, mine)


def test_dgt_flops_scales_with_batch():
    cfg = get_config("qm9_uncond_jodo")
    f1 = dgt_forward_flops(cfg, 16, 32)
    f2 = dgt_forward_flops(cfg, 32, 32)
    assert abs(f2 / f1 - 2.0) < 1e-6


def test_mfu_math():
    import os

    os.environ["JODO_PEAK_TFLOPS"] = "100"
    try:
        # 50 TFLOP in 1s on a 100 TFLOP/s chip = 0.5 MFU
        assert abs(mfu(50e12, 1.0) - 0.5) < 1e-9
        assert device_peak_flops() == 100e12
    finally:
        del os.environ["JODO_PEAK_TFLOPS"]
