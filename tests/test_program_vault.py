"""Exported-program vault: round-trip, keying, corruption handling."""

import numpy as np
import jax
import jax.numpy as jnp

from jodo_tpu.runtime import program_vault as pv


def _exported():
    from jax import export as jexport

    f = jax.jit(lambda x: x * 2.0 + 1.0)
    return jexport.export(f)(jnp.ones((4,)))


def test_vault_roundtrip_and_keying(tmp_path, monkeypatch):
    monkeypatch.setenv("JODO_PROGRAM_VAULT_DIR", str(tmp_path))
    exp = _exported()
    key = pv.vault_key("test", "sig-a")
    assert pv.vault_load(key) is None
    pv.vault_store(key, exp)
    exp2 = pv.vault_load(key)
    assert exp2 is not None
    out = jax.jit(exp2.call)(jnp.arange(4.0))
    np.testing.assert_allclose(np.asarray(out), np.arange(4.0) * 2 + 1)
    # a different signature must map to a different entry
    assert pv.vault_key("test", "sig-b") != key
    assert pv.vault_load(pv.vault_key("test", "sig-b")) is None


def test_vault_corrupt_entry_is_a_miss(tmp_path, monkeypatch):
    monkeypatch.setenv("JODO_PROGRAM_VAULT_DIR", str(tmp_path))
    key = pv.vault_key("test", "sig-c")
    (tmp_path / (key + ".jaxexp")).write_bytes(b"not an exported program")
    assert pv.vault_load(key) is None  # and the bad entry is removed
    assert not (tmp_path / (key + ".jaxexp")).exists()


def test_vault_disable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("JODO_PROGRAM_VAULT_DIR", str(tmp_path))
    monkeypatch.setenv("JODO_PROGRAM_VAULT", "0")
    assert not pv.vault_enabled()
    pv.vault_store(pv.vault_key("test", "x"), _exported())
    assert list(tmp_path.iterdir()) == []


def test_sampling_build_populates_vault(tmp_path, monkeypatch):
    """The sampling warm path writes one vault entry per program and a
    fresh sampling_fn (new trace caches) rebuilds from the vault with
    identical results."""
    monkeypatch.setenv("JODO_PROGRAM_VAULT_DIR", str(tmp_path))
    from jodo_tpu.configs import get_config
    from jodo_tpu.diffusion import NoiseSchedule
    from jodo_tpu.models import create_model
    from jodo_tpu.models.node_distribution import DistributionNodes
    from jodo_tpu.ops import masks_from_counts
    from jodo_tpu.sampling import make_sampling_fn

    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.model.dropout = 0.0
    cfg.sampling.steps = 2
    model = create_model(cfg)
    B, N = 4, 8
    nm, em = masks_from_counts(jnp.asarray([5, 8, 3, 6]), N)
    xh = jax.random.normal(jax.random.PRNGKey(0), (B, N, 9)) * nm[..., None]
    ex = jax.random.normal(jax.random.PRNGKey(1), (B, N, N, 2)) * em[..., None]
    params = model.init(
        jax.random.PRNGKey(2), jnp.full((B,), 0.5), xh, nm, em, ex,
        jnp.zeros((B,))
    )
    sch = NoiseSchedule.create(cfg.sde.schedule)
    dist = DistributionNodes({5: 1, 6: 2, 7: 3, 8: 1}, seed=0)
    fn = make_sampling_fn(cfg, sch, model, dist, batch_size=4, n_samples=6,
                          pad_n=N)
    fn.warm(params, seed=0)
    entries = list(tmp_path.iterdir())
    assert entries, "warm() should populate the vault"
    mols = fn(params, seed=0)
    # a brand-new sampling fn (fresh jit/trace caches) loads from vault
    fn2 = make_sampling_fn(cfg, sch, model, dist, batch_size=4, n_samples=6,
                           pad_n=N)
    fn2.warm(params, seed=0)
    assert list(tmp_path.iterdir()) == entries  # reused, not rewritten
    mols2 = fn2(params, seed=0)
    assert len(mols) == len(mols2) == 6
    # the final host-side shuffle is order-randomising: compare as sets
    # of exact position tensors
    canon = lambda ms: sorted(np.asarray(m[0]).tobytes() for m in ms)
    assert canon(mols) == canon(mols2)
