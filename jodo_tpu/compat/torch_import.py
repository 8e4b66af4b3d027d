"""Import reference PyTorch DGT checkpoints into jodo_tpu flax params.

The reference ships trained checkpoints (Zenodo record 8002902,
README.md:108-129) as torch state_dicts of DGT_concat / cond_DGT_concat /
DGT_concat_2D / DGT_concat_sim (models/mol_gnn.py). This module maps them
onto the dense flax DGT — including the two re-factorisations this
framework makes for TPU efficiency:

  * the pair-concat Dense of the equivariant update
    (MultiCondEquiUpdate.input_lin) is split column-block-wise into
    input_lin_{i,j,e,d}
  * node2edge_lin becomes a bias-free kernel + explicit bias
  * attention edge gates are raw kernels lin_edge{0,1}_kernel

Conventions: torch Linear weight [out,in] -> flax kernel [in,out].
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = ["convert_dgt_state_dict", "convert_cdgs_state_dict",
           "load_reference_checkpoint"]


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _dense(sd, prefix, bias=True):
    out = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _gbf(sd, prefix):
    """CondGaussianLayer / GaussianLayer params."""
    out = {
        "means": jnp.asarray(_np(sd[f"{prefix}.means.weight"]).reshape(-1)),
        "stds": jnp.asarray(_np(sd[f"{prefix}.stds.weight"]).reshape(-1)),
    }
    if f"{prefix}.time_mlp.1.weight" in sd:
        out["Dense_0"] = _dense(sd, f"{prefix}.time_mlp.1")
    return out


def convert_dgt_state_dict(sd: Dict, config) -> Dict:
    """Reference DGT state_dict -> {'params': ...} for models.create_model.

    Handles the 'module.' prefix torch.nn.DataParallel adds
    (models/utils.py:27)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    m = config.model
    hidden = int(m.nf)
    edge_hidden = hidden // 4
    n_layers = int(m.n_layers)
    equivariant = m.name not in ("DGT_concat_2D", "DGT2D")
    dist_gbf = bool(getattr(m, "dist_gbf", False)) and equivariant
    dist_dim = edge_hidden if dist_gbf else 1

    p: Dict = {}
    p["node_emb"] = _dense(sd, "node_emb")
    p["edge_emb"] = _dense(sd, "edge_emb")

    if "time_mlp.1.weight" in sd:
        p["time_mlp"] = {
            "LearnedSinusoidalEmb_0": {
                "weights": jnp.asarray(_np(sd["time_mlp.0.weights"]))
            },
            "Dense_0": _dense(sd, "time_mlp.1"),
            "Dense_1": _dense(sd, "time_mlp.3"),
        }
    if "dist_layer.means.weight" in sd:
        p["dist_layer"] = _gbf(sd, "dist_layer")

    for i in range(n_layers):
        b = f"e_block_{i}"
        blk: Dict = {}
        if equivariant:
            blk["edge_emb"] = _dense(sd, f"{b}.edge_emb")
            if f"{b}.dist_layer.means.weight" in sd:
                blk["dist_layer"] = _gbf(sd, f"{b}.dist_layer")

        # node2edge: W(h_i+h_j)+b -> kernel + explicit bias
        n2e = _dense(sd, f"{b}.node2edge_lin")
        blk["node2edge_lin"] = {"kernel": n2e["kernel"]}
        blk["node2edge_bias"] = n2e["bias"]

        attn = {
            "lin_query": _dense(sd, f"{b}.attn_mpnn.lin_query"),
            "lin_key": _dense(sd, f"{b}.attn_mpnn.lin_key"),
            "lin_value": _dense(sd, f"{b}.attn_mpnn.lin_value"),
            "lin_edge0_kernel": jnp.asarray(
                _np(sd[f"{b}.attn_mpnn.lin_edge0.weight"]).T
            ),
            "lin_edge1_kernel": jnp.asarray(
                _np(sd[f"{b}.attn_mpnn.lin_edge1.weight"]).T
            ),
        }
        blk["attn"] = attn

        blk["ff_node"] = {
            "Dense_0": _dense(sd, f"{b}.ff_linear1"),
            "Dense_1": _dense(sd, f"{b}.ff_linear2"),
        }
        blk["ff_edge"] = {
            "Dense_0": _dense(sd, f"{b}.ff_linear3"),
            "Dense_1": _dense(sd, f"{b}.ff_linear4"),
        }
        if f"{b}.node_time_mlp.1.weight" in sd:
            blk["node_time_mlp"] = _dense(sd, f"{b}.node_time_mlp.1")
            blk["edge_time_mlp"] = _dense(sd, f"{b}.edge_time_mlp.1")

        if equivariant:
            eq_prefix = f"{b}.equi_update"
            full = _dense(sd, f"{eq_prefix}.input_lin")
            w = full["kernel"]  # [2*hidden + edge_hidden + dist_dim, hidden]
            o1, o2 = hidden, 2 * hidden
            o3 = o2 + edge_hidden
            c0 = _dense(sd, f"{eq_prefix}.coord_mlp.0")
            eq = {
                "input_lin_i": {"kernel": w[:o1], "bias": full["bias"]},
                "input_lin_j": {"kernel": w[o1:o2]},
                "input_lin_e_kernel": w[o2:o3],
                "input_lin_d_kernel": w[o3 : o3 + dist_dim],
                "coord_mlp_0_kernel": c0["kernel"],
                "coord_mlp_0_bias": c0["bias"],
                "coord_mlp_1_kernel": jnp.asarray(
                    _np(sd[f"{eq_prefix}.coord_mlp.2.weight"]).T
                ),
                "coord_norm_scale": jnp.asarray(
                    _np(sd[f"{eq_prefix}.coord_norm.scale"]).reshape(1)
                ),
            }
            if f"{eq_prefix}.time_mlp.1.weight" in sd:
                eq["time_mlp"] = _dense(sd, f"{eq_prefix}.time_mlp.1")
            blk["equi_update"] = eq

        p[b] = blk
        p[f"node_{i}"] = _dense(sd, f"node_{i}")
        p[f"edge_{i}"] = _dense(sd, f"edge_{i}")

    for name in ("node_pred_mlp", "edge_type_mlp", "edge_exist_mlp"):
        for j, torch_idx in enumerate((0, 2, 4)):
            p[f"{name}_{j}"] = _dense(sd, f"{name}.{torch_idx}")

    if "cond_mlp.0.weight" in sd:
        p["cond_mlp_0"] = _dense(sd, "cond_mlp.0")
        p["cond_mlp_1"] = _dense(sd, "cond_mlp.2")
        p["cond_lin"] = _dense(sd, "cond_lin")

    return {"params": p}


def _conv1x1(sd, prefix):
    """conv1x1 (reference models/cdgs.py:153-156) -> channel Dense."""
    w = _np(sd[f"{prefix}.weight"])[:, :, 0, 0]  # [out, in, 1, 1]
    return {
        "kernel": jnp.asarray(w.T),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _gn(sd, prefix):
    return {"GroupNorm_0": {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }}


def convert_cdgs_state_dict(sd: Dict, config) -> Dict:
    """Reference CDGS state_dict -> {'params': ...} for models.create_model.

    The reference stores everything in one nn.ModuleList keyed
    'all_modules.<idx>' in construction order (models/cdgs.py:223-279);
    this walks the same order. ff_linear3's pair Dense is factored as a
    bias-free kernel + explicit bias (applied after the broadcast add)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    m = config.model
    n_layers = int(m.n_layers)

    p: Dict = {}
    mi = 0
    if bool(m.cond_time):
        p["temb_0"] = _dense(sd, f"all_modules.{mi}"); mi += 1
        p["temb_1"] = _dense(sd, f"all_modules.{mi}"); mi += 1
    p["bond_cate_proj"] = _conv1x1(sd, f"all_modules.{mi}"); mi += 1
    p["bond_exist_proj"] = _conv1x1(sd, f"all_modules.{mi}"); mi += 1
    p["bond_spd_proj"] = _conv1x1(sd, f"all_modules.{mi}"); mi += 1
    p["bond_in"] = _dense(sd, f"all_modules.{mi}"); mi += 1
    p["atom_degree_proj"] = _dense(sd, f"all_modules.{mi}"); mi += 1
    p["atom_cate_proj"] = _dense(sd, f"all_modules.{mi}"); mi += 1
    p["atom_rwl_proj"] = _dense(sd, f"all_modules.{mi}"); mi += 1
    p["atom_in"] = _dense(sd, f"all_modules.{mi}"); mi += 1

    for i in range(n_layers):
        b = f"all_modules.{mi}"; mi += 1
        ff3 = _dense(sd, f"{b}.ff_linear3")
        p[f"block_{i}"] = {
            "t_node": _dense(sd, f"{b}.t_node"),
            "t_edge": _dense(sd, f"{b}.t_edge"),
            "local": {
                "Dense_0": _dense(sd, f"{b}.local_model.nn.0"),
                "Dense_1": _dense(sd, f"{b}.local_model.nn.2"),
            },
            "norm1_local": _gn(sd, f"{b}.norm1_local"),
            "norm1_attn": _gn(sd, f"{b}.norm1_attn"),
            "self_attn": {
                "lin_query": _dense(sd, f"{b}.self_attn.lin_query"),
                "lin_key": _dense(sd, f"{b}.self_attn.lin_key"),
                "lin_value": _dense(sd, f"{b}.self_attn.lin_value"),
                "lin_edge0_kernel": jnp.asarray(
                    _np(sd[f"{b}.self_attn.lin_edge0.weight"]).T),
                "lin_edge1_kernel": jnp.asarray(
                    _np(sd[f"{b}.self_attn.lin_edge1.weight"]).T),
            },
            "ff1": _dense(sd, f"{b}.ff_linear1"),
            "ff2": _dense(sd, f"{b}.ff_linear2"),
            "ff3": {"kernel": ff3["kernel"]},
            "ff3_bias": ff3["bias"],
            "ff4": _dense(sd, f"{b}.ff_linear4"),
            "norm2_node": _gn(sd, f"{b}.norm2_node"),
            "norm2_edge": _gn(sd, f"{b}.norm2_edge"),
        }
        p[f"atom_skip_{i}"] = _dense(sd, f"all_modules.{mi}"); mi += 1
        p[f"bond_skip_{i}"] = _dense(sd, f"all_modules.{mi}"); mi += 1

    for name, conv in (("atom_out", False), ("bond_out", True),
                       ("exist_out", True)):
        for j in range(3):
            fn = _conv1x1 if conv else _dense
            p[f"{name}_{j}"] = fn(sd, f"all_modules.{mi}"); mi += 1

    return {"params": p}


def load_reference_checkpoint(path: str, config, which: str = "ema"):
    """Load a reference .pth training checkpoint ({optimizer, model, ema,
    step}, utils.py:23-30) and return (flax_params, step).

    which='ema' uses the EMA shadow parameters (what the reference evaluates
    with, run_lib.py:222); which='model' uses the raw model weights.
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    step = int(state.get("step", 0))
    if which == "ema":
        # The reference's EMA serialises shadow_params as a bare list
        # aligned with [p for p in parameters() if requires_grad]
        # (ema.py:79-86). state_dict() detaches, so requires_grad is
        # useless after torch.load; align positionally instead. DGT/CDGS
        # have no buffers, so state_dict order == parameters() order;
        # guard with a floating-point filter in case of int buffers.
        shadow = state["ema"]["shadow_params"]
        model_sd = state["model"]
        keys = list(model_sd.keys())
        if len(keys) != len(shadow):
            keys = [k for k, v in model_sd.items()
                    if getattr(v, "is_floating_point", lambda: True)()]
        if len(keys) != len(shadow):
            raise ValueError(
                f"cannot align EMA shadow_params ({len(shadow)}) with model "
                f"state_dict ({len(model_sd)} entries)")
        sd = dict(zip(keys, shadow))
    else:
        sd = state["model"]
    convert = (
        convert_cdgs_state_dict
        if str(config.model.name) == "CDGS"
        else convert_dgt_state_dict
    )
    return convert(sd, config), step
