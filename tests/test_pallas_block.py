"""Exactness of the fully-fused DGT block path (ops/pallas_dgt.py).

Runs the kernels in interpret mode on CPU (tests/conftest.py pins the
platform) and diffs a full DGT forward against the XLA path on the same
parameters — the two paths must agree to bf16/f32 tolerance with
identical parameter trees (checkpoint compatibility).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.configs import get_config
from jodo_tpu.models import create_model


def _cfg(block: bool, dtype: str):
    cfg = get_config("qm9_uncond_jodo")
    cfg.model.nf = 64
    cfg.model.n_layers = 2
    cfg.model.n_heads = 8
    cfg.model.n_extra_heads = 2
    cfg.model.dropout = 0.0
    cfg.tpu.compute_dtype = dtype
    cfg.tpu.use_pallas = not block
    cfg.tpu.use_pallas_block = block
    return cfg


@pytest.mark.parametrize("dtype,tol", [("float32", 5e-3), ("bfloat16", 6e-2)])
def test_fused_block_matches_xla(rng, dtype, tol):
    b, n, feat, edge_ch = 2, 16, 9, 2
    ref = create_model(_cfg(False, dtype))
    fused = create_model(_cfg(True, dtype))

    nm_np = np.ones((b, n), np.float32)
    nm_np[0, 11:] = 0.0
    em_np = nm_np[:, :, None] * nm_np[:, None, :] * (1 - np.eye(n))[None]
    nm, em = jnp.asarray(nm_np), jnp.asarray(em_np)
    t = jnp.asarray(rng.uniform(0.2, 0.8, (b,)), jnp.float32)
    xh = jnp.asarray(rng.normal(0, 1, (b, n, feat)), jnp.float32) * nm[..., None]
    e = jnp.asarray(rng.normal(0, 1, (b, n, n, edge_ch)), jnp.float32)
    e = 0.5 * (e + jnp.swapaxes(e, 1, 2)) * em[..., None]
    cond_x = jnp.asarray(rng.normal(0, 1, (b, n, feat)), jnp.float32) * nm[..., None]
    cond_e = jnp.asarray(rng.normal(0, 1, (b, n, n, edge_ch)), jnp.float32) * em[..., None]

    p1 = ref.init(jax.random.PRNGKey(0), t, xh, nm, em, e, t)
    p2 = fused.init(jax.random.PRNGKey(0), t, xh, nm, em, e, t)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)

    o1 = ref.apply(p1, t, xh, nm, em, e, t, cond_x, cond_e, 1.0,
                   deterministic=True)
    o2 = fused.apply(p1, t, xh, nm, em, e, t, cond_x, cond_e, 1.0,
                     deterministic=True)
    for name, a, bb in (("pred", o1[0], o2[0]), ("edge", o1[1], o2[1])):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        scale = np.abs(a).max() + 1e-9
        rel = np.abs(a - bb).max() / scale
        assert rel < tol, f"{name} mismatch: rel={rel:.3e} (tol {tol})"
