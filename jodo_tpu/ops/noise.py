"""PRNG-key-threaded noise samplers for the joint node/edge diffusion.

Replaces the reference's torch.randn-based helpers (models/utils.py:67-99)
with explicit-key jax.random equivalents so they compose with scan/jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .masks import remove_mean_with_mask

__all__ = [
    "gaussian_with_mask",
    "com_free_gaussian",
    "combined_position_feature_noise",
    "symmetric_edge_noise",
]


def gaussian_with_mask(key, shape, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Standard normal noise zeroed on padding atoms (models/utils.py:77-80)."""
    x = jax.random.normal(key, shape, dtype=jnp.float32)
    return x * node_mask[..., None]


def com_free_gaussian(key, shape, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Normal noise projected to the zero-CoM subspace (models/utils.py:67-74).

    The projection of an isotropic Gaussian is a Gaussian on the subspace, so
    this is an exact sampler for the translation-invariant position prior.
    """
    x = jax.random.normal(key, shape, dtype=jnp.float32) * node_mask[..., None]
    return remove_mean_with_mask(x, node_mask)


def combined_position_feature_noise(key, bs: int, n: int, feat_dim: int, node_mask):
    """[B,N,3+F]: CoM-free position noise ++ iid feature noise
    (models/utils.py:83-90)."""
    k1, k2 = jax.random.split(key)
    z_x = com_free_gaussian(k1, (bs, n, 3), node_mask)
    z_h = gaussian_with_mask(k2, (bs, n, feat_dim), node_mask)
    return jnp.concatenate([z_x, z_h], axis=2)


def symmetric_edge_noise(key, bs: int, n: int, edge_dim: int, edge_mask):
    """Symmetric, zero-diagonal edge noise [B,N,N,E] (models/utils.py:93-99).

    Strictly-lower-triangular iid normal mirrored to the upper triangle, then
    masked: entries (i,j) and (j,i) share one N(0,1) sample, diagonal is 0.
    """
    z = jax.random.normal(key, (bs, n, n, edge_dim), dtype=jnp.float32)
    tril = jnp.tril(jnp.ones((n, n), dtype=jnp.float32), k=-1)[None, :, :, None]
    z = z * tril
    z = z + jnp.swapaxes(z, 1, 2)
    return z * edge_mask[..., None]
