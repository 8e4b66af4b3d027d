"""Cross-cutting invariances: padding, loss rotation invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from jodo_tpu.configs import get_config
from jodo_tpu.diffusion import NoiseSchedule
from jodo_tpu.losses import make_graph_loss_fn
from jodo_tpu.models import create_model
from jodo_tpu.ops import masks_from_counts, remove_mean_with_mask
from jodo_tpu.training.step import make_apply_fn


def tiny(cfg):
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    return cfg


def test_forward_padding_invariance():
    """The same molecules padded to N=12 vs N=20 must produce identical
    outputs on the real atoms — the central mask-correctness property of
    the dense static-shape design."""
    cfg = tiny(get_config("qm9_uncond_jodo"))
    model = create_model(cfg)
    B = 2
    counts = jnp.asarray([7, 10])

    def build(npad):
        nm, em = masks_from_counts(counts, npad)
        key = jax.random.PRNGKey(0)
        xh = jax.random.normal(key, (B, npad, 9)) * nm[..., None]
        xh = xh.at[:, :, :3].set(remove_mean_with_mask(xh[:, :, :3], nm))
        ex = jax.random.normal(jax.random.PRNGKey(1), (B, npad, npad, 2))
        ex = 0.5 * (ex + jnp.swapaxes(ex, 1, 2)) * em[..., None]
        return nm, em, xh, ex

    # build at N=20, then truncate the SAME data to N=12 so real-atom
    # content matches exactly
    nm20, em20, xh20, ex20 = build(20)
    nm12 = nm20[:, :12]
    em12 = em20[:, :12, :12]
    xh12 = xh20[:, :12]
    ex12 = ex20[:, :12, :12]

    t = jnp.full((B,), 0.5)
    nl = jnp.zeros((B,))
    params = model.init(jax.random.PRNGKey(2), t, xh12, nm12, em12, ex12, nl)

    pred12, epred12 = model.apply(params, t, xh12, nm12, em12, ex12, nl)
    pred20, epred20 = model.apply(params, t, xh20, nm20, em20, ex20, nl)

    np.testing.assert_allclose(
        np.asarray(pred20[:, :12]), np.asarray(pred12), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(epred20[:, :12, :12]), np.asarray(epred12), atol=2e-4
    )
    # padding region is exactly zero
    assert np.abs(np.asarray(pred20[:, 12:])).max() == 0.0


def test_loss_translation_invariance():
    """Translating raw input conformers must not change the training loss:
    batch preparation projects onto the zero-CoM subspace before the
    diffusion (reference process_edge_batch, losses.py:487), so the
    prepared batch — and hence the loss with a fixed key — is identical."""
    from jodo_tpu.data import prepare_graph_batch
    from jodo_tpu.ops import DataScaler

    cfg = tiny(get_config("qm9_uncond_jodo"))
    model = create_model(cfg)
    schedule = NoiseSchedule.create("cosine")
    loss_fn = make_graph_loss_fn(schedule, cfg)
    bind = make_apply_fn(model, train=False)
    scaler = DataScaler.from_config(cfg)

    B, N = 4, 8
    nm, em = masks_from_counts(jnp.asarray([5, 8, 6, 7]), N)
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3)) * nm[..., None]
    onehot = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (B, N), 0, 5), 5
    ) * nm[..., None]
    fc = jnp.zeros((B, N, 1))
    ex = jax.random.normal(jax.random.PRNGKey(2), (B, N, N, 2))
    ex = 0.5 * (ex + jnp.swapaxes(ex, 1, 2)) * em[..., None]

    def make_batch(p):
        raw = {"positions": p, "atom_one_hot": onehot, "formal_charges": fc,
               "edge_one_hot": ex, "node_mask": nm, "edge_mask": em}
        return prepare_graph_batch(raw, scaler)

    b0 = make_batch(pos)
    shift = jnp.asarray([3.0, -1.0, 0.5])
    b1 = make_batch(pos + shift * nm[..., None])

    params = model.init(
        jax.random.PRNGKey(3), jnp.full((B,), 0.5), b0["xh"], nm, em,
        b0["edge_x"], jnp.zeros((B,)),
    )
    key = jax.random.PRNGKey(5)
    l0 = float(loss_fn(bind(params), key, b0))
    l1 = float(loss_fn(bind(params), key, b1))
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
