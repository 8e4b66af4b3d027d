"""Batched Kabsch alignment (the SE(3) trick behind `noise_align`).

Computes per-molecule optimal rotations aligning the clean conformer to the
noisy one before building regression targets (reference: losses.py:390-434).
All 3x3, fully batched through jnp.linalg.svd; wrapped in stop_gradient at the
loss site to match the reference's @torch.no_grad decorators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kabsch_rotation", "align_positions", "align_noise"]


def kabsch_rotation(coords_pred: jnp.ndarray, coords_tar: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotations R s.t. R @ coords_tar ~ coords_pred.

    coords_* [B, N, 3] (zero rows for padding atoms contribute nothing to the
    covariance). Returns [B, 3, 3]. Matches reference kabsch_batch
    (losses.py:423-434): A = pred^T tar; R = U diag(1,1,sign det A) V^T.
    """
    a = jnp.einsum("bki,bkj->bij", coords_pred, coords_tar)
    u, _, vt = jnp.linalg.svd(a)
    # reflection correction via sign(det U * det V^T): identical to
    # sign(det A) in exact arithmetic when A is nonsingular (det A =
    # det U * prod(sigma) * det V^T, sigma >= 0), but stays a crisp +-1
    # for singular covariances (collinear/coplanar clouds, <=2 effective
    # atoms) where the f32 det(A) sign is pure rounding noise and the
    # naive formula returns reflections ~50% of the time.
    det_uv = jnp.linalg.det(u) * jnp.linalg.det(vt)
    sign_det = jnp.where(det_uv < 0, -1.0, 1.0).astype(a.dtype)
    corr = jnp.ones((a.shape[0], 3), dtype=a.dtype).at[:, -1].set(sign_det)
    rot = jnp.einsum("bij,bj,bjk->bik", u, corr, vt)
    # non-finite fallback (should not trigger; belt-and-braces for fuzzed
    # inputs): identity keeps the loss well-defined
    finite = jnp.all(jnp.isfinite(rot), axis=(1, 2), keepdims=True)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rot.dtype), rot.shape)
    return jnp.where(finite, rot, eye)


def align_positions(z_t: jnp.ndarray, xh: jnp.ndarray) -> jnp.ndarray:
    """Rotate clean positions into the frame of the noisy ones.

    Returns aligned pos_0 [B, N, 3] (reference get_align_position,
    losses.py:403-411). einsum '...ki,...ji->...jk' == pos_0 @ R^T rows.
    """
    pos_t = z_t[:, :, :3]
    pos_0 = xh[:, :, :3]
    rot = kabsch_rotation(pos_t, pos_0)
    return jnp.einsum("bki,bji->bjk", rot, pos_0)


def align_noise(z_t, xh, alpha_t, sigma_t, noise, node_mask):
    """Recompute position noise against the aligned clean positions
    (reference get_align_noise, losses.py:390-400)."""
    pos_t = z_t[:, :, :3]
    align_pos_0 = align_positions(z_t, xh)
    a = alpha_t[:, None, None]
    s = sigma_t[:, None, None]
    noise_pos = (pos_t - a * align_pos_0) / s
    return jnp.concatenate([noise_pos, noise[:, :, 3:]], axis=-1)
