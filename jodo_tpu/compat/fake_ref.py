"""Synthetic reference-format state dicts (tests + parity-harness dry run).

Shape-exact replicas of the PyTorch reference checkpoints' state_dict
layout (DGT_concat family: mol_gnn.py:410-1124; CDGS: cdgs.py:223-279),
filled with random values. Used as converter/parity fixtures and by the
one-command parity harness's --dry-run mode (compat/parity_harness.py)
to validate every step except the blocked Zenodo download.
"""

from __future__ import annotations

import numpy as np

__all__ = ["make_fake_state_dict", "make_fake_cdgs_state_dict"]


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
    time_dim = int(getattr(m, "time_dim", 0)) or hidden * 4
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
