"""Named experiment configs mirroring the reference's 8 config files."""

from .base import base_config, pad_nodes


def qm9_uncond_jodo():
    """Joint 2D+3D JODO on QM9 (reference: configs/vpsde_qm9_uncond_jodo.py)."""
    c = base_config()
    # train-side pad ladder matching the sampler's (VERDICT r3 task #3):
    # ~50% of QM9 molecules fit pad 20; flat pad 32 wastes ~60% of the
    # N^2 pair FLOPs on padding
    c.training.bucket_pads = "16,20,24,32"
    return c


def geom_uncond_jodo():
    """Joint 2D+3D JODO on GEOM-Drugs (reference: configs/vpsde_geom_uncond_jodo.py)."""

    c = base_config()
    c.tpu.remat_attn = True  # N=184 pair residuals: remat for memory
    c.data.root = "data/geom"
    c.data.name = "GeomDrug"
    c.data.processed_file = "data_geom_drug_1.pt"
    c.data.info_name = "geom_with_h_1"
    c.data.include_aromatic = True
    c.data.atom_types = 16
    c.data.bond_types = 5
    c.data.fc_scale = [-2.0, 3.0]
    c.data.max_node = 181
    c.model.edge_ch = 3
    c.model.n_layers = 10
    c.model.mlp_ratio = 4
    c.model.spatial_cut_off = 3.0
    c.model.loss_weights = "1, 0.25, 0.1"
    c.training.batch_size = 16
    c.training.bucket_pads = "48,64,96,128"  # typical GEOM mol ~44 atoms; flat pad 184 wastes ~94% of pair FLOPs
    # bucket_batch_scale stays 1.0 (reference batch-16 protocol): the r5
    # equal-wall-clock A/B (benchmarks/geom_quality_ab.py, BASELINE r5)
    # measured scale 8 at 7x fewer optimizer steps for only 1.44x the
    # data throughput — 3D atom stability 0.33 vs 0.71 at equal minutes.
    # Set 8.0 explicitly for data-ingest throughput benchmarking only.
    c.training.eval_batch_size = 16
    c.optim.grad_clip = 20.0
    c.eval.batch_size = 1000
    return c


def qm9_cond_jodo():
    """Single-property conditional JODO on QM9 (configs/vpsde_qm9_cond_jodo.py)."""
    c = base_config()
    c.exp_type = "vpsde_edge_cond"
    c.cond_property = "alpha"
    c.data.transform = "EdgeComCond"
    c.data.info_name = "qm9_second_half"
    c.model.name = "CondDGT"
    c.model.cond_ch = 1
    c.training.bucket_pads = "16,20,24,32"  # same ladder as qm9_uncond
    c.training.n_iters = 2000000
    c.eval.begin_ckpt = 40
    c.eval.end_ckpt = 40
    c.eval.sub_geometry = False
    return c


def qm9_cond_multi_jodo():
    """Two-property conditional JODO on QM9 (configs/vpsde_qm9_cond_multi_jodo.py)."""
    c = qm9_cond_jodo()
    c.exp_type = "vpsde_edge_cond_multi"
    del c.cond_property
    c.cond_property1 = "alpha"
    c.cond_property2 = "mu"
    c.data.transform = "EdgeComCondMulti"
    c.model.cond_ch = 2
    c.eval.begin_ckpt = 50
    c.eval.end_ckpt = 50
    return c


def zinc_2d_jodo():
    """2D JODO on ZINC250k (configs/vpsde_zinc_2d_jodo.py)."""
    c = base_config()
    c.exp_type = "vpsde"
    c.only_2D = True
    c.data.root = "data/zinc250k"
    c.data.name = "Zinc250k"
    c.data.info_name = "zinc250k"
    c.data.atom_types = 9
    c.data.max_node = 38
    c.model.name = "DGT2D"
    c.model.normalize_factors = "1, 2, 2, 1"
    c.model.time_dim = 1024
    c.model.n_extra_heads = 1
    c.model.loss_weights = "1., 1., 0.5"
    c.optim.grad_clip = 20.0
    c.eval.batch_size = 2000
    c.eval.begin_ckpt = 10
    c.eval.end_ckpt = 10
    c.eval.sub_geometry = False
    return c


def moses_2d_jodo():
    """2D JODO on MOSES (configs/vpsde_moses_2d_jodo.py)."""
    c = zinc_2d_jodo()
    c.data.root = "data/moses"
    c.data.name = "MOSES"
    c.data.info_name = "moses"
    c.data.include_aromatic = True
    c.data.atom_types = 7
    c.data.max_node = 27
    c.model.edge_ch = 3
    c.training.n_iters = 1200000
    return c


def qm9_2d_cdgs():
    """CDGS on QM9 2D (configs/vpsde_qm9_2d_cdgs.py)."""
    c = base_config()
    c.exp_type = "vpsde"
    c.only_2D = True
    c.sde.schedule = "linear"
    c.model.name = "CDGS"
    c.model.pred_data = False
    c.model.include_fc_charge = False
    c.model.normalize_factors = "1, 2, 2, 1"
    c.model.self_cond = False
    c.model.rw_depth = 8
    c.model.softmax_inf = False
    c.model.loss_weights = "1., 1., 0.5"
    c.eval.batch_size = 10000
    c.eval.begin_ckpt = 90
    c.eval.end_ckpt = 100
    c.eval.sub_geometry = False
    return c


def geom_2d_cdgs():
    """CDGS on GEOM-Drugs 2D (configs/vpsde_geom_2d_cdgs.py)."""
    c = qm9_2d_cdgs()
    c.tpu.remat_attn = True  # N=184 pair residuals: remat for memory
    c.data.root = "data/geom"
    c.data.name = "GeomDrug"
    c.data.processed_file = "data_geom_drug_1.pt"
    c.data.info_name = "geom_with_h_1"
    c.data.include_aromatic = True
    c.data.atom_types = 16
    c.data.bond_types = 5
    c.data.fc_scale = [-2.0, 3.0]
    c.data.max_node = 181
    c.model.edge_ch = 3
    c.model.n_layers = 6
    c.model.rw_depth = 16
    c.optim.grad_clip = 20.0
    c.training.batch_size = 16
    c.training.bucket_pads = "48,64,96,128"  # typical GEOM mol ~44 atoms; flat pad 184 wastes ~94% of pair FLOPs
    # bucket_batch_scale 1.0 — see geom_uncond_jodo note (r5 A/B)
    c.training.eval_batch_size = 16
    c.eval.batch_size = 200
    c.eval.begin_ckpt = 20
    c.eval.end_ckpt = 20
    return c


CONFIGS = {
    "qm9_uncond_jodo": qm9_uncond_jodo,
    "geom_uncond_jodo": geom_uncond_jodo,
    "qm9_cond_jodo": qm9_cond_jodo,
    "qm9_cond_multi_jodo": qm9_cond_multi_jodo,
    "zinc_2d_jodo": zinc_2d_jodo,
    "moses_2d_jodo": moses_2d_jodo,
    "qm9_2d_cdgs": qm9_2d_cdgs,
    "geom_2d_cdgs": geom_2d_cdgs,
}


def get_config(name: str):
    return CONFIGS[name]()


__all__ = ["base_config", "pad_nodes", "get_config", "CONFIGS"] + list(CONFIGS)
