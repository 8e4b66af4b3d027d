"""Model registry (replaces the reference's decorator registry +
torch.nn.DataParallel wrap in models/utils.py:5-28; parallelism here is
handled by jit/shard_map at the training-step level, not the model)."""

from __future__ import annotations

from .dgt import DGT, DGTBlock
from .cdgs import CDGS
from .egnn import EGNNRegressor
from .node_distribution import DistributionNodes, get_node_dist


def _compute_dtype(config) -> str:
    try:
        return str(config.tpu.compute_dtype)
    except AttributeError:
        return "float32"


def _use_pallas(config) -> bool:
    try:
        return bool(config.tpu.use_pallas)
    except AttributeError:
        return False


def _flag(config, name) -> bool:
    try:
        return bool(getattr(config.tpu, name))
    except AttributeError:
        return False


def create_model(config, pallas_overrides=None):
    """Instantiate the denoiser flax module described by `config.model`.

    Accepts both our short names and the reference's registry names so
    reference configs map 1:1.

    pallas_overrides: optional dict overriding the tpu.use_pallas* flags
    (e.g. {'use_pallas': True, 'use_pallas_block': False}) — used by the
    sampling path to pick the measured-fastest kernel per round pad; the
    parameter tree is identical across paths (tests/test_pallas_block.py).
    """
    m = config.model
    name = m.name
    in_node_dim = config.data.atom_types + int(m.include_fc_charge)
    aliases = {
        "DGT_concat": "DGT",
        "cond_DGT_concat": "CondDGT",
        "DGT_concat_2D": "DGT2D",
        "DGT_concat_sim": "DGTSim",
    }
    name = aliases.get(name, name)

    pallas = dict(
        use_pallas=_use_pallas(config),
        use_pallas_equi=_flag(config, "use_pallas_equi"),
        fold_equi_ln=_flag(config, "fold_equi_ln"),
        use_pallas_edge_chain=_flag(config, "use_pallas_edge_chain"),
        use_pallas_block=_flag(config, "use_pallas_block"),
    )
    if pallas_overrides:
        pallas.update(pallas_overrides)
    common = dict(
        in_node_dim=in_node_dim,
        edge_ch=m.edge_ch,
        hidden_dim=m.nf,
        n_layers=m.n_layers,
        heads=m.n_heads,
        cond_time=m.cond_time,
        softmax_inf=m.softmax_inf,
        pred_data=m.pred_data,
        mlp_ratio=m.mlp_ratio,
        dropout=m.dropout,
        edge_quan_th=m.edge_quan_th,
        time_dim=int(getattr(m, "time_dim", 0) or 0),
        compute_dtype=_compute_dtype(config),
        remat_attn=bool(getattr(config.tpu, "remat_attn", True)),
        remat_ffn=bool(getattr(config.tpu, "remat_ffn", False)),
        **pallas,
    )
    if name == "DGT":
        return DGT(
            extra_heads=m.n_extra_heads,
            dist_gbf=m.dist_gbf,
            gbf_name=m.gbf_name,
            com_each_layer=m.CoM,
            spatial_cut_off=m.spatial_cut_off,
            equivariant=True,
            **common,
        )
    if name == "CondDGT":
        return DGT(
            extra_heads=m.n_extra_heads,
            dist_gbf=m.dist_gbf,
            gbf_name=m.gbf_name,
            com_each_layer=m.CoM,
            spatial_cut_off=m.spatial_cut_off,
            equivariant=True,
            cond_ch=m.cond_ch,
            **common,
        )
    if name == "DGTSim":
        return DGT(
            extra_heads=0,
            dist_gbf=m.dist_gbf,
            gbf_name=m.gbf_name,
            com_each_layer=m.CoM,
            spatial_cut_off=m.spatial_cut_off,
            equivariant=True,
            **common,
        )
    if name == "DGT2D":
        return DGT(
            extra_heads=m.n_extra_heads,
            dist_gbf=False,
            equivariant=False,
            **common,
        )
    if name == "CDGS":
        return CDGS(
            atom_ch=config.data.atom_types,
            bond_ch=m.edge_ch,
            nf=m.nf,
            n_layers=m.n_layers,
            heads=m.n_heads,
            rw_depth=m.rw_depth,
            dropout=m.dropout,
            cond_time=m.cond_time,
        )
    raise ValueError(f"Unknown model name: {config.model.name}")


__all__ = [
    "DGT",
    "DGTBlock",
    "CDGS",
    "EGNNRegressor",
    "create_model",
    "DistributionNodes",
    "get_node_dist",
]
