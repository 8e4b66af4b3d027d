"""Discretisation of sampled tensors into molecule tuples.

post_process (reference sampling.py:53-141): inverse-scale then discretise
atoms (argmax), charges (round), bonds (compressed thresholding or argmax).
Runs as vectorised jnp on device; the final per-molecule truncation to
n_nodes happens on host (mol_process, sampling.py:12-50).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["post_process", "post_process_2d", "mol_process", "mol_process_2d"]


def _discretise_edges(h_edge, compress_edge: bool):
    if compress_edge:
        edge_exist = (h_edge[..., 0] >= 0.5).astype(jnp.float32)
        et = h_edge[..., 1] * 3.0
        edge_type = jnp.where(
            et >= 2.5,
            3.0,
            jnp.where(et >= 1.5, 2.0, jnp.where(et >= 0.5, 1.0, 0.0)),
        )
        edge_type = edge_exist * edge_type
        if h_edge.shape[-1] == 3:
            aromatic = (h_edge[..., 2] >= 0.5).astype(jnp.float32) * edge_exist
            edge_type = jnp.where((aromatic > 0) & (edge_type == 0), 4.0, edge_type)
        return edge_type
    # one-hot style: all-below-threshold => no bond, else argmax+1
    exist = jnp.sum(h_edge > 0.5, axis=-1) != 0
    edge_type = jnp.argmax(h_edge, axis=-1).astype(jnp.float32) + 1.0
    return exist * edge_type


def post_process(
    xh,
    atom_types: int,
    include_charge: bool,
    node_mask,
    inverse_scaler,
    edge_x=None,
    edge_mask=None,
    compress_edge: bool = False,
):
    """xh [B,N,3+A(+1)] -> (pos, one_hot, formal_charges, edge_types?)."""
    pos = xh[:, :, :3]
    if include_charge:
        h_int = xh[:, :, -1:]
        h_cat = xh[:, :, 3:-1]
    else:
        h_int = jnp.zeros_like(xh[:, :, :0])
        h_cat = xh[:, :, 3:]
    assert h_cat.shape[-1] == atom_types

    if edge_x is not None:
        pos, h_cat, h_int, h_edge = inverse_scaler.inverse(
            pos, h_cat, h_int, node_mask, edge_x, edge_mask
        )
    else:
        pos, h_cat, h_int = inverse_scaler.inverse(pos, h_cat, h_int, node_mask)

    nm = node_mask[..., None]
    one_hot = jnp.eye(atom_types)[jnp.argmax(h_cat, axis=2)] * nm
    h_int = jnp.round(h_int) * nm

    if edge_x is not None:
        edge_types = _discretise_edges(h_edge, compress_edge)
        return pos, one_hot, h_int, edge_types
    return pos, one_hot, h_int


def post_process_2d(
    xh,
    atom_types: int,
    include_charge: bool,
    node_mask,
    inverse_scaler,
    edge_x,
    edge_mask,
    compress_edge: bool = False,
):
    """2D variant: xh [B,N,A(+1)] (sampling.py:100-141)."""
    if include_charge:
        h_int = xh[:, :, -1:]
        h_cat = xh[:, :, :-1]
    else:
        h_int = jnp.zeros_like(xh[:, :, :0])
        h_cat = xh
    assert h_cat.shape[-1] == atom_types

    _, h_cat, h_int, h_edge = inverse_scaler.inverse(
        None, h_cat, h_int, node_mask, edge_x, edge_mask
    )
    nm = node_mask[..., None]
    one_hot = jnp.eye(atom_types)[jnp.argmax(h_cat, axis=2)] * nm
    h_int = jnp.round(h_int) * nm
    edge_types = _discretise_edges(h_edge, compress_edge)
    return one_hot, h_int, edge_types


def mol_process(one_hot, pos, formal_charges, n_nodes, edge_types=None) -> List[Tuple]:
    """Device tensors -> per-molecule numpy tuples, truncated to true size.

    Returns [(pos [n,3], atom_type [n], edge_type [n,n], fc [n])] or
    [(pos, atom_type)] without edges — the decode format every evaluation
    metric consumes (sampling.py:12-50).
    """
    one_hot = np.asarray(one_hot)
    pos = np.asarray(pos)
    fcs = np.asarray(formal_charges)
    ets = np.asarray(edge_types) if edge_types is not None else None
    out = []
    for i in range(one_hot.shape[0]):
        n = int(n_nodes[i])
        atom_type = one_hot[i, :n].argmax(1).astype(np.int64)
        p = pos[i, :n].astype(np.float64)
        if ets is not None:
            et = ets[i, :n, :n].astype(np.int64)
            if fcs.shape[-1] != 0:
                fc = fcs[i, :n, 0].astype(np.int64)
            else:
                fc = np.zeros((n,), np.int64)
            out.append((p, atom_type, et, fc))
        else:
            out.append((p, atom_type))
    return out


def mol_process_2d(one_hot, formal_charges, n_nodes, edge_types) -> List[Tuple]:
    one_hot = np.asarray(one_hot)
    fcs = np.asarray(formal_charges)
    ets = np.asarray(edge_types)
    out = []
    for i in range(one_hot.shape[0]):
        n = int(n_nodes[i])
        atom_type = one_hot[i, :n].argmax(1).astype(np.int64)
        et = ets[i, :n, :n].astype(np.int64)
        if fcs.shape[-1] != 0:
            fc = fcs[i, :n, 0].astype(np.int64)
        else:
            fc = np.zeros((n,), np.int64)
        out.append((None, atom_type, et, fc))
    return out
