"""Frozen EGNN property regressors for conditional-generation scoring.

The reference loads pretrained torch EGNN checkpoints and wraps them in
DataParallel (run_lib.py:656-660, cond_gen/model.py:15-23). Here the model
is the flax EGNNRegressor; weights can be imported from the reference's
torch checkpoints via `load_torch_egnn_params`, or trained in-framework
with `train_property_classifier` (script-level utility).
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.egnn import EGNNRegressor

__all__ = ["make_classifier_fn", "load_torch_egnn_params"]


def make_classifier_fn(model: EGNNRegressor, params) -> Callable:
    """Returns jitted clf(one_hot, pos, node_mask, edge_mask) -> [B]."""

    @jax.jit
    def clf(one_hot, pos, node_mask, edge_mask):
        return model.apply(params, one_hot, pos, node_mask, edge_mask)

    return clf


def load_torch_egnn_params(checkpoint_path: str, hidden_nf: int = 128,
                           n_layers: int = 7, in_node_nf: int = 5):
    """Convert a reference EGNN torch state_dict into flax params.

    Mapping (cond_gen/model.py:26-70 -> models/egnn.py):
      embedding                  -> embedding
      gcl_%d.edge_mlp.{0,2}      -> gcl_%d.edge_mlp_{0,1}
      gcl_%d.node_mlp.{0,2}      -> gcl_%d.node_mlp_{0,1}
      node_dec.{0,2}             -> node_dec_{0,1}
      graph_dec.{0,2}            -> graph_dec_{0,1}
    (the masked EGNN variant has no coordinate update, so coord_mlp and
    att_mlp entries, if present, are ignored)
    """
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def dense(prefix):
        w = np.asarray(sd[f"{prefix}.weight"].detach().numpy()).T
        b = np.asarray(sd[f"{prefix}.bias"].detach().numpy())
        return {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    params = {"embedding": dense("embedding")}
    for i in range(n_layers):
        # edge_mlp.0 consumed [h_i, h_j, radial]; our EGCL factors it into
        # three per-node/per-pair Denses -> split the kernel column blocks
        full = dense(f"gcl_{i}.edge_mlp.0")
        w = full["kernel"]
        params[f"gcl_{i}"] = {
            "edge_mlp_0_i": {"kernel": w[:hidden_nf], "bias": full["bias"]},
            "edge_mlp_0_j": {"kernel": w[hidden_nf : 2 * hidden_nf]},
            "edge_mlp_0_r": {"kernel": w[2 * hidden_nf :]},
            "edge_mlp_1": dense(f"gcl_{i}.edge_mlp.2"),
            "node_mlp_0": dense(f"gcl_{i}.node_mlp.0"),
            "node_mlp_1": dense(f"gcl_{i}.node_mlp.2"),
        }
    params["node_dec_0"] = dense("node_dec.0")
    params["node_dec_1"] = dense("node_dec.2")
    params["graph_dec_0"] = dense("graph_dec.0")
    params["graph_dec_1"] = dense("graph_dec.2")
    return {"params": params}
