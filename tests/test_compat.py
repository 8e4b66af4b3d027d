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
from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model
from jodo_tpu.ops import masks_from_counts


def make_fake_state_dict(cfg, rng, variant="joint"):
    """Shapes mirror reference DGT_concat (mol_gnn.py:410-489), or with
    variant="2d"/"sim" DGT_concat_2D (:797-946) / DGT_concat_sim
    (:949-1124)."""
    m = cfg.model
    hidden = m.nf
    edge_hidden = hidden // 4
    heads = m.n_heads
    extra = 0 if variant == "sim" else m.n_extra_heads
    sub_heads = heads - extra
    out_ch = hidden // heads
    sub_ch = (heads * out_ch) // sub_heads
    time_dim = hidden * 4
    dist_dim = edge_hidden
    in_node = cfg.data.atom_types + 1
    in_edge = m.edge_ch * 2 + (0 if variant == "2d" else dist_dim)
    cat_node = (hidden * 2) // m.n_layers
    cat_edge = (edge_hidden * 2) // m.n_layers

    sd = {}

    def lin(name, out_d, in_d, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(out_d, in_d)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=(out_d,)).astype(np.float32) * 0.05

    def gbf(prefix, k, tdim):
        sd[f"{prefix}.means.weight"] = rng.normal(size=(1, k - 1)).astype(np.float32)
        sd[f"{prefix}.stds.weight"] = rng.normal(size=(1, k - 1)).astype(np.float32)
        lin(f"{prefix}.time_mlp.1", 2, tdim)

    lin("node_emb", hidden, in_node * 2)
    lin("edge_emb", edge_hidden, in_edge)
    sd["time_mlp.0.weights"] = rng.normal(size=(8,)).astype(np.float32)
    lin("time_mlp.1", time_dim, 17)
    lin("time_mlp.3", time_dim, time_dim)
    if variant != "2d":
        gbf("dist_layer", dist_dim, time_dim)

    for i in range(m.n_layers):
        b = f"e_block_{i}"
        if variant != "2d":
            lin(f"{b}.edge_emb", edge_hidden, edge_hidden + dist_dim)
        lin(f"{b}.node2edge_lin", edge_hidden, hidden)
        lin(f"{b}.attn_mpnn.lin_query", sub_heads * sub_ch, hidden)
        lin(f"{b}.attn_mpnn.lin_key", sub_heads * sub_ch, hidden)
        lin(f"{b}.attn_mpnn.lin_value", heads * out_ch, hidden)
        lin(f"{b}.attn_mpnn.lin_edge0", sub_heads * sub_ch, edge_hidden, bias=False)
        lin(f"{b}.attn_mpnn.lin_edge1", heads * out_ch, edge_hidden, bias=False)
        lin(f"{b}.ff_linear1", hidden * m.mlp_ratio, hidden)
        lin(f"{b}.ff_linear2", hidden, hidden * m.mlp_ratio)
        lin(f"{b}.ff_linear3", edge_hidden * m.mlp_ratio, edge_hidden)
        lin(f"{b}.ff_linear4", edge_hidden, edge_hidden * m.mlp_ratio)
        lin(f"{b}.node_time_mlp.1", hidden * 6, time_dim)
        lin(f"{b}.edge_time_mlp.1", edge_hidden * 6, time_dim)
        if variant != "2d":
            gbf(f"{b}.dist_layer", edge_hidden, time_dim)
            eq = f"{b}.equi_update"
            lin(f"{eq}.input_lin", hidden,
                hidden * 2 + edge_hidden + dist_dim)
            lin(f"{eq}.time_mlp.1", hidden * 2, time_dim)
            lin(f"{eq}.coord_mlp.0", hidden, hidden)
            lin(f"{eq}.coord_mlp.2", 1 + extra, hidden, bias=False)
            sd[f"{eq}.coord_norm.scale"] = np.asarray([1e-2], np.float32)
        lin(f"node_{i}", cat_node, hidden)
        lin(f"edge_{i}", cat_edge, edge_hidden)

    lin("node_pred_mlp.0", hidden, cat_node * m.n_layers + hidden)
    lin("node_pred_mlp.2", hidden // 2, hidden)
    lin("node_pred_mlp.4", in_node, hidden // 2)
    lin("edge_type_mlp.0", edge_hidden, cat_edge * m.n_layers + edge_hidden)
    lin("edge_type_mlp.2", edge_hidden // 2, edge_hidden)
    lin("edge_type_mlp.4", m.edge_ch - 1, edge_hidden // 2)
    lin("edge_exist_mlp.0", edge_hidden, cat_edge * m.n_layers + edge_hidden)
    lin("edge_exist_mlp.2", edge_hidden // 2, edge_hidden)
    lin("edge_exist_mlp.4", 1, edge_hidden // 2)
    return sd


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


def make_fake_cdgs_state_dict(cfg, rng):
    """Shapes mirror reference CDGS (models/cdgs.py:223-279): one flat
    nn.ModuleList keyed all_modules.<idx> in construction order."""
    m = cfg.model
    nf = m.nf
    bond_ch = m.edge_ch
    atom_ch = cfg.data.atom_types
    rw = m.rw_depth
    bond_se = int(nf * 0.4)
    bond_type = int(0.5 * (nf - bond_se))
    atom_se = int(nf * 0.2)
    atom_type = nf - 2 * atom_se
    cat_dim = (nf * 2) // m.n_layers

    sd = {}
    idx = [0]

    def lin(out_d, in_d, bias=True, conv=False, sub=None):
        name = f"all_modules.{idx[0]}" + (f".{sub}" if sub else "")
        if sub is None:
            idx[0] += 1
        shape = (out_d, in_d, 1, 1) if conv else (out_d, in_d)
        sd[f"{name}.weight"] = rng.normal(size=shape).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=(out_d,)).astype(np.float32) * 0.05

    def gn(sub):
        name = f"all_modules.{idx[0]}.{sub}"
        sd[f"{name}.weight"] = rng.normal(size=(nf,)).astype(np.float32) * 0.1 + 1.0
        sd[f"{name}.bias"] = rng.normal(size=(nf,)).astype(np.float32) * 0.05

    if m.cond_time:
        lin(nf * 2, nf)
        lin(nf, nf * 2)
    lin(bond_type, bond_ch - 1, conv=True)
    lin(bond_type, 1, conv=True)
    lin(bond_se, rw + 1, conv=True)
    lin(nf, bond_se + 2 * bond_type)
    lin(atom_se, bond_ch)
    lin(atom_type, atom_ch)
    lin(atom_se, rw)
    lin(nf, atom_type + 2 * atom_se)

    for _ in range(m.n_layers):
        lin(nf, nf, sub="t_node")
        lin(nf, nf, sub="t_edge")
        sd[f"all_modules.{idx[0]}.local_model.eps"] = np.zeros((1,), np.float32)
        lin(nf, nf, sub="local_model.nn.0")
        lin(nf, nf, sub="local_model.nn.2")
        lin(nf, nf, sub="self_attn.lin_key")
        lin(nf, nf, sub="self_attn.lin_query")
        lin(nf, nf, sub="self_attn.lin_value")
        lin(nf, nf, bias=False, sub="self_attn.lin_edge0")
        lin(nf, nf, bias=False, sub="self_attn.lin_edge1")
        gn("norm1_local")
        gn("norm1_attn")
        lin(nf * 2, nf, sub="ff_linear1")
        lin(nf, nf * 2, sub="ff_linear2")
        gn("norm2_node")
        lin(nf * 2, nf, sub="ff_linear3")
        lin(nf, nf * 2, sub="ff_linear4")
        gn("norm2_edge")
        idx[0] += 1  # close the block module
        lin(cat_dim, nf)
        lin(cat_dim, nf)

    lin(nf, cat_dim * m.n_layers + atom_type)
    lin(nf // 2, nf)
    lin(atom_ch, nf // 2)
    lin(nf, cat_dim * m.n_layers + bond_type, conv=True)
    lin(nf // 2, nf, conv=True)
    lin(bond_ch - 1, nf // 2, conv=True)
    lin(nf, cat_dim * m.n_layers + bond_type, conv=True)
    lin(nf // 2, nf, conv=True)
    lin(1, nf // 2, conv=True)
    return sd
