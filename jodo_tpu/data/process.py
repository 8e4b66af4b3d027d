"""On-device batch preparation: CoM removal, scaling, xh packing.

jit-traced equivalent of the reference's process_batch / process_batch_2D /
process_edge_batch (losses.py:437-497); runs as the first ops of the
compiled train step instead of on host.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..ops.masks import remove_mean_with_mask
from ..ops.scalers import DataScaler

__all__ = ["prepare_graph_batch", "prepare_2d_batch", "prepare_node_batch"]


def _normalize_context(context, prop_norm_values):
    if context is None or prop_norm_values is None:
        return context
    means = jnp.asarray([v["mean"] for v in prop_norm_values], jnp.float32)
    mads = jnp.asarray([v["mad"] for v in prop_norm_values], jnp.float32)
    return (context - means[None]) / mads[None]


def prepare_graph_batch(
    raw: Dict, scaler: DataScaler, include_charges: bool = True,
    prop_norm_values=None,
) -> Dict:
    """raw batch -> {xh, edge_x, node_mask, edge_mask, context?}."""
    nm = raw["node_mask"]
    em = raw["edge_mask"]
    pos = remove_mean_with_mask(raw["positions"], nm)
    fc = raw["formal_charges"] if include_charges else raw["formal_charges"][:, :, :0]
    pos, atom, fc, edge = scaler.scale(
        pos, raw["atom_one_hot"], fc, nm, raw["edge_one_hot"], em
    )
    out = {
        "xh": jnp.concatenate([pos, atom, fc], axis=2),
        "edge_x": edge,
        "node_mask": nm,
        "edge_mask": em,
    }
    ctx = raw.get("context")
    if ctx is not None:
        out["context"] = _normalize_context(ctx, prop_norm_values)
    return out


def prepare_2d_batch(
    raw: Dict, scaler: DataScaler, include_charges: bool = True,
    prop_norm_values=None,
) -> Dict:
    nm = raw["node_mask"]
    em = raw["edge_mask"]
    fc = raw["formal_charges"] if include_charges else raw["formal_charges"][:, :, :0]
    _, atom, fc, edge = scaler.scale(
        None, raw["atom_one_hot"], fc, nm, raw["edge_one_hot"], em
    )
    out = {
        "xh": jnp.concatenate([atom, fc], axis=2),
        "edge_x": edge,
        "node_mask": nm,
        "edge_mask": em,
    }
    ctx = raw.get("context")
    if ctx is not None:
        out["context"] = _normalize_context(ctx, prop_norm_values)
    return out


def prepare_node_batch(
    raw: Dict, scaler: DataScaler, include_charges: bool = True,
) -> Dict:
    nm = raw["node_mask"]
    pos = remove_mean_with_mask(raw["positions"], nm)
    fc = raw["formal_charges"] if include_charges else raw["formal_charges"][:, :, :0]
    pos, atom, fc = scaler.scale(pos, raw["atom_one_hot"], fc, nm)
    return {
        "xh": jnp.concatenate([pos, atom, fc], axis=2),
        "node_mask": nm,
        "edge_mask": raw["edge_mask"],
    }
