"""Mask construction and center-of-mass projection, dense & branch-free.

The reference builds masks in host Python loops (reference: sampling.py:194-201)
and keeps a flattened [B*N*N, 1] edge mask; here everything is a vectorised
function of per-molecule atom counts so it can live inside jit/scan.

Shape conventions (whole framework):
  pos        [B, N, 3]
  h          [B, N, C]      (atom one-hot + optional formal charge)
  e          [B, N, N, E]   (dense edge features, symmetric)
  node_mask  [B, N]         float {0,1}
  edge_mask  [B, N, N]      float {0,1}; off-diagonal, both endpoints real
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "node_mask_from_counts",
    "edge_mask_from_node_mask",
    "masks_from_counts",
    "remove_mean_with_mask",
    "masked_mean_zero_error",
]


def node_mask_from_counts(n_nodes: jnp.ndarray, max_nodes: int) -> jnp.ndarray:
    """[B] int -> [B, N] float mask (1 for real atoms)."""
    ar = jnp.arange(max_nodes)[None, :]
    return (ar < n_nodes[:, None]).astype(jnp.float32)


def edge_mask_from_node_mask(node_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, N] -> [B, N, N]: both endpoints real, diagonal removed.

    Matches the reference mask: node outer product minus the diagonal
    (reference: sampling.py:197-199).
    """
    em = node_mask[:, :, None] * node_mask[:, None, :]
    n = node_mask.shape[-1]
    return em * (1.0 - jnp.eye(n, dtype=em.dtype))[None]


def masks_from_counts(n_nodes: jnp.ndarray, max_nodes: int):
    nm = node_mask_from_counts(n_nodes, max_nodes)
    return nm, edge_mask_from_node_mask(nm)


def remove_mean_with_mask(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Project positions onto the zero-CoM subspace of the real atoms.

    x [B, N, D], node_mask [B, N]. Matches reference
    models/utils.py:38-45 (mean over real atoms, subtracted on real atoms).
    """
    nm = node_mask[..., None]
    n = jnp.sum(nm, axis=1, keepdims=True)
    mean = jnp.sum(x * nm, axis=1, keepdims=True) / jnp.maximum(n, 1.0)
    return (x - mean) * nm


def masked_mean_zero_error(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Relative CoM error, the quantity asserted <1e-2 by the reference
    (models/utils.py:59-64). Returned as a value so callers can chex-check
    it in tests instead of crashing inside jit."""
    err = jnp.abs(jnp.sum(x * node_mask[..., None], axis=1)).max()
    largest = jnp.abs(x).max()
    return err / (largest + 1e-10)
