"""Train step: loss decreases, EMA tracks, adaptive clip, checkpoint RT."""

import jax
import jax.numpy as jnp
import numpy as np

from jodo_tpu.configs import get_config
from jodo_tpu.diffusion import NoiseSchedule
from jodo_tpu.losses import make_loss_fn
from jodo_tpu.models import create_model
from jodo_tpu.ops import masks_from_counts, remove_mean_with_mask
from jodo_tpu.training import (
    TrainState,
    adaptive_clip,
    ema_update,
    init_clip_state,
    make_optimizer,
    make_train_step,
)

B, N = 4, 8


def tiny_cfg():
    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.optim.warmup = 2
    return cfg


def make_batch(key):
    k1, k2 = jax.random.split(key)
    nm, em = masks_from_counts(jnp.asarray([5, 8, 3, 6]), N)
    xh = jax.random.normal(k1, (B, N, 9)) * nm[..., None]
    xh = xh.at[:, :, :3].set(remove_mean_with_mask(xh[:, :, :3], nm))
    ex = jax.random.normal(k2, (B, N, N, 2))
    ex = 0.5 * (ex + jnp.swapaxes(ex, 1, 2)) * em[..., None]
    return {"xh": xh, "edge_x": ex, "node_mask": nm, "edge_mask": em}


def test_train_step_reduces_loss():
    cfg = tiny_cfg()
    model = create_model(cfg)
    schedule = NoiseSchedule.create(cfg.sde.schedule)
    loss_fn = make_loss_fn(schedule, cfg)
    tx = make_optimizer(cfg)

    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.full((B,), 0.5), batch["xh"], batch["node_mask"], batch["edge_mask"],
        batch["edge_x"], jnp.zeros((B,)),
    )
    state = TrainState.create(params, tx)
    step = make_train_step(model, loss_fn, tx, cfg.model.ema_decay, cfg.optim.grad_clip,
                           donate=False)

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    # same-batch overfit: average of last 5 well below first 5
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9
    assert np.isfinite(losses).all()


def test_node_loss_fn_both_prediction_modes():
    """Node-only loss (pred_edge=False; reference get_sde_node_loss_fn,
    losses.py:128-207): finite value and gradient in both the data-pred
    (Kabsch-aligned target, sqrt(a/s) scaling) and noise-pred
    (aligned-noise target) branches, with the self-cond teacher active."""
    from jodo_tpu.losses import make_node_loss_fn

    cfg = tiny_cfg()
    cfg.pred_edge = False
    schedule = NoiseSchedule.create(cfg.sde.schedule)
    batch = make_batch(jax.random.PRNGKey(0))

    def make_stub(scale):
        def apply_fn(t, z, nm, em, ex, nl, cond_x=None, cond_edge_x=None,
                     cond_flag=0.0, context=None, dropout_key=None):
            assert ex is None and cond_edge_x is None  # node-only contract
            out = scale * z
            if cond_x is not None:
                out = out + 0.01 * cond_flag * cond_x
            return out * nm[..., None]
        return apply_fn

    for pred_data in (True, False):
        cfg.model.pred_data = pred_data
        loss_fn = make_node_loss_fn(schedule, cfg)

        def objective(s, key):
            return loss_fn(make_stub(s), key, batch)

        for seed in (0, 1, 2):  # hit both self-cond bernoulli branches
            key = jax.random.PRNGKey(seed)
            val, grad = jax.value_and_grad(objective)(0.9, key)
            assert np.isfinite(float(val)), (pred_data, seed)
            assert np.isfinite(float(grad)), (pred_data, seed)


def test_ema_update_warmup_decay():
    ema = {"w": jnp.ones((3,))}
    p = {"w": jnp.zeros((3,))}
    # early: effective decay = (1+1)/(10+1) = 2/11
    out = ema_update(ema, p, decay=0.999, num_updates=1)
    np.testing.assert_allclose(np.asarray(out["w"]), 2.0 / 11.0, rtol=1e-5)
    # late: effective decay = 0.999
    out = ema_update(ema, p, decay=0.999, num_updates=100000)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.999, rtol=1e-5)


def test_adaptive_clip_behaviour():
    grads = {"w": jnp.full((4,), 10.0)}  # norm 20
    cs = init_clip_state()
    # queue has [3000]: threshold = min(1.5*3000, 10) = 10 -> scale 0.5
    clipped, cs2, norm = adaptive_clip(grads, cs, max_grad=10.0)
    np.testing.assert_allclose(float(norm), 20.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["w"]), 5.0, rtol=1e-4)
    assert int(cs2.count) == 2
    # pushed value is the clipped threshold (10), not the raw norm
    assert float(cs2.buffer[1]) == 10.0
    # plain clip path when max_grad <= 1
    clipped2, cs3, _ = adaptive_clip(grads, cs, max_grad=1.0)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(clipped2["w"])), 1.0, rtol=1e-4
    )
    assert int(cs3.count) == int(cs.count)  # queue untouched


def test_checkpoint_roundtrip(tmp_path):
    from jodo_tpu.training import CheckpointManager

    cfg = tiny_cfg()
    model = create_model(cfg)
    tx = make_optimizer(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.full((B,), 0.5), batch["xh"], batch["node_mask"], batch["edge_mask"],
        batch["edge_x"], jnp.zeros((B,)),
    )
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_meta(state)
    restored = mgr.restore_meta(state)
    chex_eq = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    del chex_eq
    mgr.save_numbered(state, 3)
    assert mgr.available_checkpoints() == [3]
    restored2 = mgr.restore_numbered(state, 3)
    assert int(restored2.step) == 0


def test_checkpoint_async_roundtrip(tmp_path):
    """Async saves (on-device snapshot + background fetch/write) must be
    durable after flush() and byte-identical to sync saves."""
    from jodo_tpu.training import CheckpointManager

    cfg = tiny_cfg()
    model = create_model(cfg)
    tx = make_optimizer(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.full((B,), 0.5), batch["xh"], batch["node_mask"], batch["edge_mask"],
        batch["edge_x"], jnp.zeros((B,)),
    )
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_meta_async(state)
    mgr.save_numbered_async(state, 7)
    # donation-safety: mutating/dropping the caller's state after submit
    # must not corrupt the snapshot (the manager copies on device)
    state2 = state.replace(step=state.step + 1)
    del state
    mgr.flush()
    assert mgr.available_checkpoints() == [7]
    restored = mgr.restore_numbered(state2, 7)
    assert int(restored.step) == 0
    restored_meta = mgr.restore_meta(state2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.params, restored_meta.params,
    )


def test_checkpoint_meta_crash_safety(tmp_path):
    """The rolling meta save alternates between two slots so a crash during
    a save can never destroy the only resume point (the single-slot scheme
    removed the destination before the new write committed), and a missing
    meta falls back to the newest numbered snapshot."""
    import os
    import shutil

    from jodo_tpu.training import CheckpointManager

    cfg = tiny_cfg()
    model = create_model(cfg)
    tx = make_optimizer(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.full((B,), 0.5), batch["xh"], batch["node_mask"], batch["edge_mask"],
        batch["edge_x"], jnp.zeros((B,)),
    )
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path))

    mgr.save_meta(state.replace(step=state.step + 1))  # slot 1, step 1
    mgr.save_meta(state.replace(step=state.step + 2))  # slot 2, step 2
    slots = sorted(os.listdir(mgr.meta_dir))
    assert slots == ["state", "state_b"], slots
    assert int(mgr.restore_meta(state).step) == 2

    # a third save overwrites the OLDER slot; the newest stays intact the
    # whole time (simulated crash: delete the slot being written)
    mgr.save_meta(state.replace(step=state.step + 3))
    assert int(mgr.restore_meta(state).step) == 3
    newest = mgr._complete_meta_paths()[0]
    shutil.rmtree(newest)  # crash destroyed the in-flight slot
    assert int(mgr.restore_meta(state).step) == 2  # survivor slot restores

    # no meta slots at all -> fall back to the highest numbered snapshot
    for p in mgr._complete_meta_paths():
        shutil.rmtree(p)
    mgr.save_numbered(state.replace(step=state.step + 41), 1)
    mgr.save_numbered(state.replace(step=state.step + 42), 2)
    assert int(mgr.restore_meta(state).step) == 42
    assert int(mgr.restore_meta(state, fallback_numbered=False).step) == 0


def test_multi_train_step_matches_sequential():
    """K steps scanned in one dispatch == K sequential single steps with
    the same per-step keys (exact same state pytree)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jodo_tpu.configs import get_config
    from jodo_tpu.run_lib import build_training, init_state

    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 32
    cfg.model.n_layers = 1
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.data.max_node = 12
    cfg.tpu.pad_nodes = 16
    cfg.training.batch_size = 4
    cfg.tpu.donate_state = False
    cfg.data.allow_synthetic = True
    cfg.data.synthetic_kind = "random"

    parts = build_training(cfg, synthetic_fallback=True)
    state0 = init_state(cfg, parts)

    loader = parts["loader"].infinite()
    k = 3
    raws = [next(loader) for _ in range(k)]
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, k)

    # sequential
    state_seq = state0
    for raw, kk in zip(raws, keys):
        batch = {kname: jnp.asarray(v) for kname, v in raw.items()}
        state_seq, m = parts["train_step"](state_seq, batch, kk)

    # one dispatch
    stacked = {kname: jnp.asarray(np.stack([r[kname] for r in raws]))
               for kname in raws[0]}
    state_multi, mm = parts["multi_train_step"](state0, stacked, key)

    assert int(state_multi.step) == int(state_seq.step) == 3
    for a, b in zip(jax.tree.leaves(state_seq.params),
                    jax.tree.leaves(state_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(float(mm["loss"]), float(m["loss"]),
                               atol=1e-5, rtol=1e-5)


def test_adam_weight_decay_coupling_matches_torch():
    """torch.optim.Adam couples L2 into the gradient before the moments
    (reference losses.py:14-25); our Adam chain must match step-for-step
    at weight_decay > 0 (VERDICT r1 weak #8)."""
    import torch
    from ml_collections import ConfigDict

    from jodo_tpu.training.optim import make_optimizer

    wd, lr, beta1, eps = 0.1, 1e-2, 0.9, 1e-8
    w0 = np.linspace(-1.0, 1.0, 6).astype(np.float32)

    cfg = ConfigDict()
    cfg.optim = ConfigDict(dict(
        optimizer="Adam", lr=lr, beta1=beta1, eps=eps,
        weight_decay=wd, warmup=0, grad_clip=-1.0,
    ))
    opt = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    opt_state = opt.init(params)

    wt = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    topt = torch.optim.Adam([wt], lr=lr, betas=(beta1, 0.999), eps=eps,
                            weight_decay=wd)

    for step in range(5):
        g = np.sin(w0 + step).astype(np.float32)  # arbitrary fixed grads
        upd, opt_state = opt.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)

        topt.zero_grad()
        wt.grad = torch.as_tensor(g.copy())
        topt.step()

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), atol=1e-6)
