"""Numerical parity: flax DGT vs the reference network semantics.

The hard correctness gate of SURVEY §7: the flax DGT, loaded with a
reference-format state_dict through compat.torch_import, must reproduce
the reference DGT_concat forward. The oracle is compat.torch_ref —
a dense pure-torch re-expression of /root/reference/models/mol_gnn.py:
491-594 (PyG's segment softmax/scatter over fully-connected graphs are
dense masked ops). Runs with zero egress: weights are a synthetic
reference-shaped state_dict (tests/test_compat.py).

Layer-by-layer activations are diffed, not just outputs, so a drift in
any block (adaLN order, extra-head masking, gate tanh, CoM) localises to
the first failing layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from jodo_tpu.compat import convert_dgt_state_dict
from jodo_tpu.compat.torch_ref import dense_dgt_forward
from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model
from jodo_tpu.ops import masks_from_counts, remove_mean_with_mask

from test_compat import make_fake_state_dict


def _cfg():
    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 32
    cfg.model.n_layers = 3
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.tpu.use_pallas = False
    cfg.tpu.compute_dtype = "float32"
    return cfg


def _inputs(cfg, b=3, n=8, seed=0, with_cond=False):
    rng = np.random.default_rng(seed)
    counts = rng.integers(4, n + 1, size=b)
    counts[-1] = n
    nm, em = masks_from_counts(jnp.asarray(counts), n)
    nm_np = np.asarray(nm, np.float32)
    em_np = np.asarray(em, np.float32)

    pos = rng.normal(size=(b, n, 3)).astype(np.float32) * nm_np[..., None]
    pos = np.asarray(remove_mean_with_mask(jnp.asarray(pos), nm))
    feats = rng.normal(size=(b, n, 6)).astype(np.float32) * nm_np[..., None]
    xh = np.concatenate([pos, feats], axis=-1)
    ex = rng.normal(size=(b, n, n, 2)).astype(np.float32)
    ex = 0.5 * (ex + ex.transpose(0, 2, 1, 3)) * em_np[..., None]
    t = np.full((b,), 0.5, np.float32)
    nl = rng.uniform(size=(b,)).astype(np.float32)

    cond_x = cond_edge_x = None
    if with_cond:
        cpos = rng.normal(size=(b, n, 3)).astype(np.float32) * nm_np[..., None]
        cfeat = rng.normal(size=(b, n, 6)).astype(np.float32) * nm_np[..., None]
        cond_x = np.concatenate([cpos, cfeat], axis=-1)
        cex = rng.normal(size=(b, n, n, 2)).astype(np.float32)
        cond_edge_x = 0.5 * (cex + cex.transpose(0, 2, 1, 3)) * em_np[..., None]
    return dict(
        t=t, xh=xh, nm=nm_np, em=em_np, ex=ex, nl=nl,
        cond_x=cond_x, cond_edge_x=cond_edge_x,
    )


@pytest.mark.parametrize("with_cond", [False, True])
def test_dgt_forward_parity(with_cond):
    cfg = _cfg()
    rng = np.random.default_rng(7)
    sd = make_fake_state_dict(cfg, rng)
    params = convert_dgt_state_dict(sd, cfg)
    model = create_model(cfg)
    inp = _inputs(cfg, with_cond=with_cond)

    # --- torch oracle ---
    tt = {k: torch.as_tensor(v) for k, v in inp.items() if v is not None}
    collect = {}
    ref_pred, ref_edge = dense_dgt_forward(
        sd, cfg, tt["t"], tt["xh"], tt["nm"], tt["em"], tt["ex"], tt["nl"],
        cond_x=tt.get("cond_x"), cond_edge_x=tt.get("cond_edge_x"),
        collect=collect,
    )

    # --- flax, capturing per-block activations ---
    kwargs = {}
    if with_cond:
        kwargs = dict(
            cond_x=jnp.asarray(inp["cond_x"]),
            cond_edge_x=jnp.asarray(inp["cond_edge_x"]),
            cond_flag=1.0,
        )
    (pred, edge_pred), state = model.apply(
        params,
        jnp.asarray(inp["t"]), jnp.asarray(inp["xh"]), jnp.asarray(inp["nm"]),
        jnp.asarray(inp["em"]), jnp.asarray(inp["ex"]), jnp.asarray(inp["nl"]),
        capture_intermediates=lambda mdl, name: "e_block" in mdl.name
        if mdl.name else False,
        mutable=["intermediates"],
        **kwargs,
    )

    inter = state["intermediates"]
    nm = jnp.asarray(inp["nm"])
    for i in range(cfg.model.n_layers):
        h_i, e_i, pos_i = inter[f"e_block_{i}"]["__call__"][0]
        pos_i = remove_mean_with_mask(pos_i, nm)  # CoM applied outside block
        np.testing.assert_allclose(
            np.asarray(h_i), collect[f"h_{i}"].numpy(), atol=2e-4,
            err_msg=f"node activations diverge at layer {i}",
        )
        np.testing.assert_allclose(
            np.asarray(e_i), collect[f"edge_{i}"].numpy(), atol=2e-4,
            err_msg=f"edge activations diverge at layer {i}",
        )
        np.testing.assert_allclose(
            np.asarray(pos_i), collect[f"pos_{i}"].numpy(), atol=2e-4,
            err_msg=f"positions diverge at layer {i}",
        )

    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(edge_pred), ref_edge.numpy(), atol=2e-4)


def _inputs_2d(cfg, b=3, n=8, seed=0, with_cond=False):
    rng = np.random.default_rng(seed)
    counts = rng.integers(4, n + 1, size=b)
    counts[-1] = n
    nm, em = masks_from_counts(jnp.asarray(counts), n)
    nm_np = np.asarray(nm, np.float32)
    em_np = np.asarray(em, np.float32)
    xh = rng.normal(size=(b, n, 6)).astype(np.float32) * nm_np[..., None]
    ex = rng.normal(size=(b, n, n, 2)).astype(np.float32)
    ex = 0.5 * (ex + ex.transpose(0, 2, 1, 3)) * em_np[..., None]
    t = np.full((b,), 0.5, np.float32)
    nl = rng.uniform(size=(b,)).astype(np.float32)
    cond_x = cond_edge_x = None
    if with_cond:
        cond_x = rng.normal(size=(b, n, 6)).astype(np.float32) * nm_np[..., None]
        cex = rng.normal(size=(b, n, n, 2)).astype(np.float32)
        cond_edge_x = 0.5 * (cex + cex.transpose(0, 2, 1, 3)) * em_np[..., None]
    return dict(t=t, xh=xh, nm=nm_np, em=em_np, ex=ex, nl=nl,
                cond_x=cond_x, cond_edge_x=cond_edge_x)


@pytest.mark.parametrize("variant,ref_name", [
    ("2d", "DGT_concat_2D"),
    ("sim", "DGT_concat_sim"),
])
@pytest.mark.parametrize("with_cond", [False, True])
def test_dgt_variant_forward_parity(variant, ref_name, with_cond):
    """Output parity for the 2D / sim denoisers (VERDICT r1 item 6):
    flax DGT (equivariant=False / extra_heads=0 degenerations) vs the
    torch oracle's variant path, on a converted reference-shaped
    state_dict (mol_gnn.py:797-946 / :949-1124)."""
    cfg = _cfg()
    cfg.model.name = ref_name
    rng = np.random.default_rng(11)
    sd = make_fake_state_dict(cfg, rng, variant=variant)
    params = convert_dgt_state_dict(sd, cfg)
    model = create_model(cfg)

    inp = (_inputs_2d if variant == "2d" else _inputs)(
        cfg, with_cond=with_cond)
    tt = {k: torch.as_tensor(v) for k, v in inp.items() if v is not None}
    ref_pred, ref_edge = dense_dgt_forward(
        sd, cfg, tt["t"], tt["xh"], tt["nm"], tt["em"], tt["ex"], tt["nl"],
        cond_x=tt.get("cond_x"), cond_edge_x=tt.get("cond_edge_x"),
        variant=variant,
    )

    kwargs = {}
    if with_cond:
        kwargs = dict(
            cond_x=jnp.asarray(inp["cond_x"]),
            cond_edge_x=jnp.asarray(inp["cond_edge_x"]),
            cond_flag=1.0,
        )
    pred, edge_pred = model.apply(
        params,
        jnp.asarray(inp["t"]), jnp.asarray(inp["xh"]), jnp.asarray(inp["nm"]),
        jnp.asarray(inp["em"]), jnp.asarray(inp["ex"]), jnp.asarray(inp["nl"]),
        **kwargs,
    )
    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(edge_pred), ref_edge.numpy(),
                               atol=2e-4)


def test_cdgs_forward_parity():
    """CDGS parity (VERDICT r1 item 6): flax CDGS vs the torch oracle
    (reference models/cdgs.py:201-408 semantics) on a converted
    reference-shaped all_modules state_dict, layer-by-layer."""
    from jodo_tpu.compat import convert_cdgs_state_dict
    from jodo_tpu.compat.torch_ref import dense_cdgs_forward
    from test_compat import make_fake_cdgs_state_dict

    cfg = get_config("qm9_2d_cdgs")
    cfg.model.nf = 32
    cfg.model.n_layers = 3
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.model.rw_depth = 4
    cfg.tpu.compute_dtype = "float32"

    rng = np.random.default_rng(23)
    sd = make_fake_cdgs_state_dict(cfg, rng)
    params = convert_cdgs_state_dict(sd, cfg)
    model = create_model(cfg)

    b, n = 3, 8
    counts = np.array([5, 7, 8])
    nm, em = masks_from_counts(jnp.asarray(counts), n)
    nm_np, em_np = np.asarray(nm, np.float32), np.asarray(em, np.float32)
    xh = rng.normal(size=(b, n, cfg.data.atom_types)).astype(np.float32)
    xh = xh * nm_np[..., None]
    ex = rng.normal(size=(b, n, n, cfg.model.edge_ch)).astype(np.float32)
    ex = 0.5 * (ex + ex.transpose(0, 2, 1, 3)) * em_np[..., None]
    t = np.linspace(0.2, 0.8, b).astype(np.float32)

    # structure must match a fresh init exactly
    ref_params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(xh), nm, em,
        jnp.asarray(ex))
    assert jax.tree.map(lambda x: x.shape, ref_params) == jax.tree.map(
        lambda x: x.shape, params)

    collect = {}
    ref_atom, ref_edge = dense_cdgs_forward(
        sd, cfg, torch.as_tensor(t), torch.as_tensor(xh),
        torch.as_tensor(nm_np), torch.as_tensor(em_np), torch.as_tensor(ex),
        collect=collect,
    )

    (atom, edge), state = model.apply(
        params, jnp.asarray(t), jnp.asarray(xh), nm, em, jnp.asarray(ex),
        capture_intermediates=lambda mdl, name: (mdl.name or "").startswith(
            "block_"),
        mutable=["intermediates"],
    )
    inter = state["intermediates"]
    for i in range(cfg.model.n_layers):
        h_i, e_i = inter[f"block_{i}"]["__call__"][0]
        np.testing.assert_allclose(
            np.asarray(h_i), collect[f"h_{i}"].numpy(), atol=2e-4,
            err_msg=f"CDGS node stream diverges at layer {i}")
        np.testing.assert_allclose(
            np.asarray(e_i), collect[f"edge_{i}"].numpy(), atol=2e-4,
            err_msg=f"CDGS edge stream diverges at layer {i}")
    np.testing.assert_allclose(np.asarray(atom), ref_atom.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(edge), ref_edge.numpy(), atol=2e-4)
