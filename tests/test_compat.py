"""Torch-checkpoint conversion: structure + numerical equivalence.

Builds a synthetic reference-style state_dict with the right shapes,
converts it, and checks (a) the flax model accepts the converted tree and
(b) the factored pair-Dense ops reproduce the original concat semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.compat import convert_dgt_state_dict
from jodo_tpu.compat.fake_ref import (  # re-exported for sibling tests
    make_fake_cdgs_state_dict,
    make_fake_state_dict,
)
from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model
from jodo_tpu.ops import masks_from_counts




def test_convert_and_forward():
    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    rng = np.random.default_rng(0)
    sd = make_fake_state_dict(cfg, rng)
    # DataParallel prefix must be stripped
    sd = {f"module.{k}": v for k, v in sd.items()}
    params = convert_dgt_state_dict(sd, cfg)

    model = create_model(cfg)
    B, N = 2, 8
    nm, em = masks_from_counts(jnp.asarray([5, 8]), N)
    xh = jax.random.normal(jax.random.PRNGKey(0), (B, N, 9)) * nm[..., None]
    ex = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 2)) * em[..., None]
    t = jnp.full((B,), 0.5)
    nl = jnp.zeros((B,))

    # structure must match a freshly-initialised tree exactly
    ref_params = model.init(jax.random.PRNGKey(2), t, xh, nm, em, ex, nl)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_params)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    pred, epred = model.apply(params, t, xh, nm, em, ex, nl)
    assert np.isfinite(np.asarray(pred)).all()
    assert np.isfinite(np.asarray(epred)).all()


def test_input_lin_split_equivalence():
    """The factored input_lin must equal Dense(concat([h_i,h_j,e,d]))."""
    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    rng = np.random.default_rng(1)
    sd = make_fake_state_dict(cfg, rng)
    params = convert_dgt_state_dict(sd, cfg)

    hidden, edge_hidden, dist_dim = 32, 8, 8
    w = sd["e_block_0.equi_update.input_lin.weight"]  # [hidden, in]
    bias = sd["e_block_0.equi_update.input_lin.bias"]
    h_i = rng.normal(size=(hidden,)).astype(np.float32)
    h_j = rng.normal(size=(hidden,)).astype(np.float32)
    e = rng.normal(size=(edge_hidden,)).astype(np.float32)
    d = rng.normal(size=(dist_dim,)).astype(np.float32)
    concat = np.concatenate([h_i, h_j, e, d])
    expected = w @ concat + bias

    eq = params["params"]["e_block_0"]["equi_update"]
    got = (
        h_i @ np.asarray(eq["input_lin_i"]["kernel"])
        + np.asarray(eq["input_lin_i"]["bias"])
        + h_j @ np.asarray(eq["input_lin_j"]["kernel"])
        + e @ np.asarray(eq["input_lin_e_kernel"])
        + d @ np.asarray(eq["input_lin_d_kernel"])
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


