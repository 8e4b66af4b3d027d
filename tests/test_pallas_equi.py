"""Fused equivariant-update kernel: parity with the jnp reference path.

The v2 kernel runs its elementwise chain in bf16 (matching the production
compute_dtype); the reference modules here are f32, so tolerances are
bf16-level, not exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.models.dgt import EquivariantCoordUpdate
from jodo_tpu.ops import masks_from_counts

B, N, H = 2, 16, 32


@pytest.mark.parametrize("extra_heads", [0, 2])
def test_fused_equi_matches_jnp(extra_heads):
    ref = EquivariantCoordUpdate(H, extra_heads, use_pallas=False)
    fused = EquivariantCoordUpdate(H, extra_heads, use_pallas=True)
    nm, em = masks_from_counts(jnp.asarray([10, 16]), N)
    h = jax.random.normal(jax.random.PRNGKey(0), (B, N, H))
    pos = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    e = jax.random.normal(jax.random.PRNGKey(2), (B, N, N, 8))
    d = jax.random.normal(jax.random.PRNGKey(3), (B, N, N, 8))
    te = jax.random.normal(jax.random.PRNGKey(4), (B, 24))
    extra = None
    if extra_heads:
        extra = (jax.random.uniform(jax.random.PRNGKey(5), (B, N, N, extra_heads))
                 > 0.5).astype(jnp.float32) * em[..., None]

    params = ref.init(jax.random.PRNGKey(6), h, pos, e, d, em, te, extra)
    out_ref = ref.apply(params, h, pos, e, d, em, te, extra)
    out_fused = fused.apply(params, h, pos, e, d, em, te, extra)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=8e-4, rtol=2e-3
    )


def test_fused_equi_no_time():
    ref = EquivariantCoordUpdate(H, 0, use_pallas=False)
    fused = EquivariantCoordUpdate(H, 0, use_pallas=True)
    nm, em = masks_from_counts(jnp.asarray([7, 12]), 12)
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 12, H))
    pos = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 3))
    e = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 12, 8))
    d = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, 8))
    params = ref.init(jax.random.PRNGKey(6), h, pos, e, d, em, None, None)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, h, pos, e, d, em, None, None)),
        np.asarray(ref.apply(params, h, pos, e, d, em, None, None)),
        atol=8e-4, rtol=2e-3,
    )
