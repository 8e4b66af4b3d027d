"""Denoiser forward contracts: shapes, masking, CoM, symmetry, equivariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model
from jodo_tpu.ops import masks_from_counts, remove_mean_with_mask

B, N = 3, 8
KEY = jax.random.PRNGKey(0)


def tiny(cfg):
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    return cfg


@pytest.fixture(scope="module")
def dgt_setup():
    cfg = tiny(get_config("qm9_uncond_jodo"))
    model = create_model(cfg)
    nm, em = masks_from_counts(jnp.asarray([5, 8, 3]), N)
    xh = jax.random.normal(KEY, (B, N, 9)) * nm[..., None]
    xh = xh.at[:, :, :3].set(remove_mean_with_mask(xh[:, :, :3], nm))
    ex = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 2))
    ex = 0.5 * (ex + jnp.swapaxes(ex, 1, 2)) * em[..., None]
    t = jnp.full((B,), 0.5)
    nl = jnp.zeros((B,))
    params = model.init(jax.random.PRNGKey(2), t, xh, nm, em, ex, nl)
    return cfg, model, params, (t, xh, nm, em, ex, nl)


def test_dgt_forward_contract(dgt_setup):
    _, model, params, (t, xh, nm, em, ex, nl) = dgt_setup
    pred, epred = model.apply(params, t, xh, nm, em, ex, nl)
    assert pred.shape == (B, N, 9)
    assert epred.shape == (B, N, N, 2)
    # CoM-free positions
    com = np.abs(np.asarray(jnp.sum(pred[:, :, :3], axis=1)))
    assert com.max() < 1e-4
    # symmetric edges with zero diagonal contributions on masked entries
    en = np.asarray(epred)
    np.testing.assert_allclose(en, np.swapaxes(en, 1, 2), atol=1e-5)
    # padding masked out
    assert np.abs(np.asarray(pred)[2, 3:]).max() == 0
    assert np.abs(en[0, 5:, :, :]).max() == 0


def test_dgt_self_cond_changes_output(dgt_setup):
    _, model, params, (t, xh, nm, em, ex, nl) = dgt_setup
    pred, epred = model.apply(params, t, xh, nm, em, ex, nl)
    pred2, _ = model.apply(
        params, t, xh, nm, em, ex, nl, cond_x=pred, cond_edge_x=epred, cond_flag=1.0
    )
    assert np.abs(np.asarray(pred2 - pred)).max() > 1e-6


def test_dgt_rotation_equivariance(dgt_setup):
    """Positions out rotate with positions in; type/edge outputs invariant."""
    _, model, params, (t, xh, nm, em, ex, nl) = dgt_setup
    pred, epred = model.apply(params, t, xh, nm, em, ex, nl)

    m = np.random.default_rng(7).normal(size=(3, 3))
    q, _ = np.linalg.qr(m)
    if np.linalg.det(q) < 0:
        q[:, -1] *= -1
    q = jnp.asarray(q, jnp.float32)
    xh_rot = xh.at[:, :, :3].set(jnp.einsum("ij,bnj->bni", q, xh[:, :, :3]))
    pred_rot, epred_rot = model.apply(params, t, xh_rot, nm, em, ex, nl)

    # atol = one bf16 ulp at |x|~0.5 (the default compute dtype): rotation
    # equivariance is exact only in exact arithmetic
    np.testing.assert_allclose(
        np.asarray(pred_rot[:, :, :3]),
        np.asarray(jnp.einsum("ij,bnj->bni", q, pred[:, :, :3])),
        atol=4e-3,
    )
    np.testing.assert_allclose(
        np.asarray(pred_rot[:, :, 3:]), np.asarray(pred[:, :, 3:]), atol=4e-3
    )
    np.testing.assert_allclose(np.asarray(epred_rot), np.asarray(epred), atol=4e-3)


def test_dgt_translation_invariance(dgt_setup):
    """Input CoM projection makes the model invariant to translations of the
    raw (pre-projection) positions; directly: outputs on CoM-projected inputs
    are unchanged when we re-project a translated input."""
    _, model, params, (t, xh, nm, em, ex, nl) = dgt_setup
    pred, _ = model.apply(params, t, xh, nm, em, ex, nl)
    shift = jnp.asarray([1.0, -2.0, 0.5])
    xh_shift = xh.at[:, :, :3].add(shift * nm[..., None])
    xh_reproj = xh_shift.at[:, :, :3].set(
        remove_mean_with_mask(xh_shift[:, :, :3], nm)
    )
    pred2, _ = model.apply(params, t, xh_reproj, nm, em, ex, nl)
    np.testing.assert_allclose(np.asarray(pred2), np.asarray(pred), atol=1e-4)


def test_dgt2d_and_cdgs_shapes():
    nm, em = masks_from_counts(jnp.asarray([5, 8, 3]), N)
    t = jnp.full((B,), 0.5)
    nl = jnp.zeros((B,))
    ex = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 2)) * em[..., None]

    cfg = tiny(get_config("zinc_2d_jodo"))
    cfg.model.time_dim = 64
    m2 = create_model(cfg)
    xh2 = jax.random.normal(jax.random.PRNGKey(3), (B, N, 10)) * nm[..., None]
    p2 = m2.init(jax.random.PRNGKey(4), t, xh2, nm, em, ex, nl)
    a2, e2 = m2.apply(p2, t, xh2, nm, em, ex, nl)
    assert a2.shape == (B, N, 10) and e2.shape == (B, N, N, 2)

    cfg3 = tiny(get_config("qm9_2d_cdgs"))
    m3 = create_model(cfg3)
    xh3 = jax.random.normal(jax.random.PRNGKey(5), (B, N, 5)) * nm[..., None]
    p3 = m3.init(jax.random.PRNGKey(6), t, xh3, nm, em, ex, nl)
    a3, e3 = m3.apply(p3, t, xh3, nm, em, ex, nl)
    assert a3.shape == (B, N, 5) and e3.shape == (B, N, N, 2)
    np.testing.assert_allclose(
        np.asarray(e3), np.asarray(jnp.swapaxes(e3, 1, 2)), atol=1e-5
    )


def test_dgt_sim_variant():
    cfg = tiny(get_config("qm9_uncond_jodo"))
    cfg.model.name = "DGT_concat_sim"
    model = create_model(cfg)
    nm, em = masks_from_counts(jnp.asarray([5, 8, 3]), N)
    xh = jax.random.normal(KEY, (B, N, 9)) * nm[..., None]
    ex = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 2)) * em[..., None]
    t = jnp.full((B,), 0.5)
    nl = jnp.zeros((B,))
    params = model.init(jax.random.PRNGKey(2), t, xh, nm, em, ex, nl)
    pred, epred = model.apply(params, t, xh, nm, em, ex, nl)
    assert pred.shape == (B, N, 9) and epred.shape == (B, N, N, 2)


def test_cond_dgt_context():
    cfg = tiny(get_config("qm9_cond_jodo"))
    model = create_model(cfg)
    nm, em = masks_from_counts(jnp.asarray([5, 8, 3]), N)
    xh = jax.random.normal(KEY, (B, N, 9)) * nm[..., None]
    ex = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 2)) * em[..., None]
    t = jnp.full((B,), 0.5)
    nl = jnp.zeros((B,))
    ctx = jnp.asarray([[0.3], [-0.1], [1.2]])
    params = model.init(jax.random.PRNGKey(2), t, xh, nm, em, ex, nl, context=ctx)
    pred, _ = model.apply(params, t, xh, nm, em, ex, nl, context=ctx)
    pred2, _ = model.apply(params, t, xh, nm, em, ex, nl, context=ctx * 2.0)
    assert np.abs(np.asarray(pred2 - pred)).max() > 1e-6


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("with_time", [True, False])
@pytest.mark.parametrize("extra_heads", [2, 0])
def test_equi_folded_ln_matches_materialised(dtype, with_time, extra_heads):
    """The algebraic LN fold in EquivariantCoordUpdate must reproduce the
    materialised LN+modulate+matmul path (same params, same inputs)."""
    from jodo_tpu.models.dgt import EquivariantCoordUpdate

    b, n, hd, e_ch, d_ch = 3, 8, 64, 16, 16
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    h = jax.random.normal(ks[0], (b, n, hd))
    pos = jax.random.normal(ks[1], (b, n, 3))
    edge_feat = jax.random.normal(ks[2], (b, n, n, e_ch))
    dist_feat = jax.random.normal(ks[3], (b, n, n, d_ch))
    em = (jnp.ones((b, n, n)) - jnp.eye(n)[None])
    time_emb = jax.random.normal(ks[4], (b, 32)) if with_time else None
    extra_adj = (
        jax.random.bernoulli(ks[5], 0.5, (b, n, n, extra_heads)).astype(
            jnp.float32)
        if extra_heads else None
    )

    def run(fold):
        mod = EquivariantCoordUpdate(
            hidden_dim=hd, extra_heads=extra_heads, dtype=dt, fold_ln=fold
        )
        params = mod.init(jax.random.PRNGKey(42), h, pos, edge_feat,
                          dist_feat, em, time_emb, extra_adj)
        out = mod.apply(params, h, pos, edge_feat, dist_feat, em, time_emb,
                        extra_adj)
        return params, np.asarray(out)

    p_fold, out_fold = run(True)
    p_mat, out_mat = run(False)
    # identical param trees (checkpoint/converter invariance)
    assert jax.tree.map(lambda a: a.shape, p_fold) == jax.tree.map(
        lambda a: a.shape, p_mat
    )
    tol = 2e-5 if dtype == "float32" else 6e-2
    np.testing.assert_allclose(out_fold, out_mat, atol=tol, rtol=tol)


def test_remat_ffn_exact_gradients():
    """tpu.remat_ffn recomputes the edge FFN (incl. its dropout masks) in
    the backward pass: flax remat replays make_rng('dropout'), so loss AND
    gradients match the no-remat path exactly and the param tree is
    unchanged (checkpoint-invariant)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jodo_tpu.configs import get_config
    from jodo_tpu.models import create_model
    from jodo_tpu.ops import masks_from_counts

    def build(remat_ffn):
        cfg = get_config("qm9_uncond_jodo")
        cfg.model.nf = 32
        cfg.model.n_layers = 2
        cfg.model.n_heads = 4
        cfg.model.dropout = 0.1
        cfg.tpu.remat_ffn = remat_ffn
        cfg.tpu.compute_dtype = "float32"
        return create_model(cfg)

    m0, m1 = build(False), build(True)
    b, n = 2, 16
    nm, em = masks_from_counts(jnp.asarray([10, 16]), n)
    xh = jax.random.normal(jax.random.PRNGKey(0), (b, n, 9)) * nm[..., None]
    ex = jax.random.normal(jax.random.PRNGKey(1), (b, n, n, 2)) * em[..., None]
    t = jnp.full((b,), 0.5)
    nl = jnp.zeros((b,))
    p0 = m0.init(jax.random.PRNGKey(2), t, xh, nm, em, ex, nl)
    p1 = m1.init(jax.random.PRNGKey(2), t, xh, nm, em, ex, nl)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))

    def loss_fn(model):
        def f(params):
            pred, e_pred = model.apply(
                params, t, xh, nm, em, ex, nl, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.sum(pred ** 2) + jnp.sum(e_pred ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss_fn(m0))(p0)
    l1, g1 = jax.value_and_grad(loss_fn(m1))(p1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)
