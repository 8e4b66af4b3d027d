"""Masks, CoM projection, noise samplers, Kabsch, scalers, features."""

import jax
import jax.numpy as jnp
import numpy as np

from jodo_tpu.ops import (
    masks_from_counts,
    node_mask_from_counts,
    remove_mean_with_mask,
    com_free_gaussian,
    combined_position_feature_noise,
    symmetric_edge_noise,
    kabsch_rotation,
    align_positions,
    DataScaler,
    pairwise_sq_dist,
    rw_spd_features,
)

KEY = jax.random.PRNGKey(0)


def test_masks_from_counts():
    nm, em = masks_from_counts(jnp.asarray([3, 5]), 6)
    assert nm.shape == (2, 6) and em.shape == (2, 6, 6)
    assert nm[0].sum() == 3 and nm[1].sum() == 5
    # no diagonal, no padding edges
    assert np.all(np.diagonal(np.asarray(em), axis1=1, axis2=2) == 0)
    assert em[0].sum() == 3 * 2  # 3 nodes fully connected off-diag
    assert em[1].sum() == 5 * 4


def test_remove_mean_idempotent_and_zero():
    nm = node_mask_from_counts(jnp.asarray([4, 7]), 8)
    x = jax.random.normal(KEY, (2, 8, 3)) * nm[..., None]
    y = remove_mean_with_mask(x, nm)
    # masked mean is ~0
    mean = np.asarray(jnp.sum(y * nm[..., None], axis=1))
    np.testing.assert_allclose(mean, 0.0, atol=1e-5)
    # idempotent
    np.testing.assert_allclose(np.asarray(remove_mean_with_mask(y, nm)), np.asarray(y), atol=1e-6)
    # padding stays zero
    assert np.all(np.asarray(y)[0, 4:] == 0)


def test_com_free_noise():
    nm = node_mask_from_counts(jnp.asarray([5, 3]), 8)
    z = com_free_gaussian(KEY, (2, 8, 3), nm)
    np.testing.assert_allclose(np.asarray(jnp.sum(z, axis=1)), 0.0, atol=1e-5)
    z2 = combined_position_feature_noise(KEY, 2, 8, 6, nm)
    assert z2.shape == (2, 8, 9)
    np.testing.assert_allclose(np.asarray(jnp.sum(z2[:, :, :3], axis=1)), 0.0, atol=1e-5)
    assert np.all(np.asarray(z2)[1, 3:] == 0)


def test_symmetric_edge_noise():
    nm, em = masks_from_counts(jnp.asarray([6, 4]), 8)
    z = symmetric_edge_noise(KEY, 2, 8, 2, em)
    zn = np.asarray(z)
    np.testing.assert_allclose(zn, np.swapaxes(zn, 1, 2), atol=1e-6)
    assert np.all(np.diagonal(zn, axis1=1, axis2=2) == 0)
    # masked entries are zero
    assert np.all(zn[1, 4:, :, :] == 0) and np.all(zn[1, :, 4:, :] == 0)
    # distribution: off-diag unit variance
    big = symmetric_edge_noise(KEY, 64, 8, 1, jnp.tile(em[:1], (64, 1, 1)))
    vals = np.asarray(big)[:, :6, :6][np.tile(~np.eye(6, dtype=bool), (64, 1, 1))]
    assert abs(vals.std() - 1.0) < 0.05


def test_kabsch_recovers_rotation():
    # random rotation applied to a point cloud must be recovered exactly
    pos0 = jax.random.normal(KEY, (4, 10, 3))
    pos0 = pos0 - pos0.mean(axis=1, keepdims=True)
    # build exact random rotations via float64 QR on host
    m = np.random.default_rng(1).normal(size=(4, 3, 3))
    q64, _ = np.linalg.qr(m)
    det = np.linalg.det(q64)
    q64 = q64 * np.stack([np.ones_like(det), np.ones_like(det), det], -1)[:, None, :]
    q = jnp.asarray(q64, dtype=jnp.float32)
    pos_rot = jnp.einsum("bij,bnj->bni", q, pos0)
    rot = kabsch_rotation(pos_rot, pos0)
    aligned = jnp.einsum("bki,bji->bjk", rot, pos0)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(pos_rot), atol=1e-4)


def test_align_positions_reduces_distance():
    z_t = jax.random.normal(KEY, (3, 8, 9))
    xh = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 9))
    aligned = align_positions(z_t, xh)
    d_before = float(jnp.sum((z_t[:, :, :3] - xh[:, :, :3]) ** 2))
    d_after = float(jnp.sum((z_t[:, :, :3] - aligned) ** 2))
    assert d_after <= d_before + 1e-4


def test_scaler_roundtrip():
    sc = DataScaler(1, 4, 4, 1, centered=True)
    nm, em = masks_from_counts(jnp.asarray([5]), 8)
    pos = jax.random.normal(KEY, (1, 8, 3)) * nm[..., None]
    atom = jax.nn.one_hot(jnp.zeros((1, 8), jnp.int32), 5) * nm[..., None]
    fc = jnp.ones((1, 8, 1)) * nm[..., None]
    edge = jnp.ones((1, 8, 8, 2)) * em[..., None]
    p, a, f, e = sc.scale(pos, atom, fc, nm, edge, em)
    p2, a2, f2, e2 = sc.inverse(p, a, f, nm, e, em)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(atom), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(fc), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(edge), atol=1e-6)


def test_pairwise_sq_dist():
    pos = jnp.asarray([[[0.0, 0, 0], [3.0, 4.0, 0]]])
    d = pairwise_sq_dist(pos)
    np.testing.assert_allclose(np.asarray(d), [[[0, 25.0], [25.0, 0]]], atol=1e-6)


def test_rw_spd_matches_numpy_formula():
    # independent NumPy evaluation of the same random-walk/SPD definition
    rng = np.random.default_rng(3)
    a = (rng.random((2, 5, 5)) < 0.4).astype(np.float64)
    a = np.triu(a, 1)
    a = a + np.swapaxes(a, 1, 2)
    k_step = 3
    ad = a / (a.sum(-1, keepdims=True) + 1e-8)
    powers = []
    cur = ad
    for _ in range(k_step):
        cur = cur @ ad
        powers.append(cur)
    rw_map = np.stack(powers, axis=1)  # [B, k, N, N]
    landing_np = np.moveaxis(np.diagonal(rw_map, axis1=2, axis2=3), 1, 2)
    spd_ind_np = (rw_map <= 0).sum(axis=1)

    rw_landing, spd = rw_spd_features(jnp.asarray(a, jnp.float32), k_step)
    assert rw_landing.shape == (2, 5, 3)
    assert spd.shape == (2, 5, 5, 4)
    np.testing.assert_allclose(np.asarray(rw_landing), landing_np, atol=1e-5)
    np.testing.assert_array_equal(np.argmax(np.asarray(spd), -1), spd_ind_np)


def test_kabsch_seed_robust_and_degenerate():
    """200-seed property test (VERDICT r1 weak #5): kabsch_rotation must
    always return a proper rotation (orthogonal, det +1) and never NaN,
    including degenerate clouds (collinear, coplanar, <=2 atoms, zeros)."""
    eye = np.eye(3, dtype=np.float32)
    for seed in range(200):
        rng = np.random.default_rng(seed)
        kind = seed % 5
        n = int(rng.integers(2, 12))
        if kind == 0:  # generic cloud
            p = rng.normal(size=(1, n, 3))
        elif kind == 1:  # collinear
            t = rng.normal(size=(1, n, 1))
            p = t * rng.normal(size=(1, 1, 3))
        elif kind == 2:  # coplanar
            basis = rng.normal(size=(2, 3))
            p = rng.normal(size=(1, n, 2)) @ basis[None]
        elif kind == 3:  # two atoms
            p = rng.normal(size=(1, 2, 3))
        else:  # all zeros
            p = np.zeros((1, n, 3))
        p = (p - p.mean(axis=1, keepdims=True)).astype(np.float32)
        q = rng.normal(size=(1, p.shape[1], 3)).astype(np.float32)
        rot = np.asarray(kabsch_rotation(jnp.asarray(q), jnp.asarray(p)))
        assert np.isfinite(rot).all(), seed
        np.testing.assert_allclose(rot[0] @ rot[0].T, eye, atol=1e-4,
                                   err_msg=f"seed {seed}")
        assert abs(np.linalg.det(rot[0]) - 1.0) < 1e-3, seed
