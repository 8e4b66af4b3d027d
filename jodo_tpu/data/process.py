"""On-device batch preparation: CoM removal, scaling, xh packing.

jit-traced equivalent of the reference's process_batch / process_batch_2D /
process_edge_batch (losses.py:437-497); runs as the first ops of the
compiled train step instead of on host.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.masks import masks_from_counts, remove_mean_with_mask
from ..ops.scalers import DataScaler

__all__ = [
    "prepare_graph_batch",
    "prepare_2d_batch",
    "prepare_node_batch",
    "decode_compact_batch",
    "make_batch_decoder",
]


def decode_compact_batch(
    raw: Dict,
    num_atom_types: int,
    compress_edge: bool = True,
    include_aromatic: bool = False,
    bond_types: int = 4,
) -> Dict:
    """Expand an integer-coded batch (core.collate_batch_compact) to the
    dense float batch, ON DEVICE inside the jitted step.

    No-op passthrough for already-dense batches, so every consumer can call
    it unconditionally. Exactness vs collate_batch is tested
    (tests/test_data.py). The one-hot/mask expansion is a handful of fused
    VPU compare/select ops — free next to the model forward — while the
    host->device transfer shrinks ~9x (see collate_batch_compact)."""
    if "bond_code" not in raw:
        return raw
    code = raw["bond_code"].astype(jnp.int32)
    pad_n = code.shape[-1]
    nm, em = masks_from_counts(raw["n_nodes"], pad_n)
    # padding rows carry atom_types == -1 -> one_hot gives all-zeros there,
    # matching the dense collate's zero rows
    one_hot = jax.nn.one_hot(
        raw["atom_types"].astype(jnp.int32), num_atom_types, dtype=jnp.float32
    )
    fc = raw["charges"].astype(jnp.float32)[..., None]
    if compress_edge:
        # [exist, order/3 (aromatic->0), (aromatic)] — EdgeCom encoding
        # (reference datasets/build_dataset.py:150-171)
        exist = (code > 0).astype(jnp.float32)
        order = jnp.where(code == 4, 0, code).astype(jnp.float32) / 3.0
        chans = [exist, order]
        if include_aromatic:
            chans.append((code == 4).astype(jnp.float32))
        edge = jnp.stack(chans, axis=-1)
    else:
        # one-hot over bond codes 1..bond_types-1; code 0 (no bond) maps to
        # index -1 which one_hot zeroes
        edge = jax.nn.one_hot(code - 1, bond_types - 1, dtype=jnp.float32)
    out = {
        "atom_one_hot": one_hot,
        "formal_charges": fc,
        "edge_one_hot": edge,
        "node_mask": nm,
        "edge_mask": em,
    }
    if "positions" in raw:
        out["positions"] = raw["positions"]
    if "context" in raw:
        out["context"] = raw["context"]
    return out


def make_batch_decoder(config):
    """Bind the dataset's edge/atom encoding into a decode closure."""
    num_atom_types = int(config.data.atom_types)
    compress_edge = bool(config.data.compress_edge)
    include_aromatic = bool(config.data.include_aromatic)
    bond_types = int(config.data.bond_types)

    def decode(raw: Dict) -> Dict:
        return decode_compact_batch(
            raw, num_atom_types, compress_edge, include_aromatic, bond_types
        )

    return decode


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
