"""Ancestral (reverse-SDE) samplers as single jit-compiled lax.scan loops.

The reference runs a Python loop with per-step host sync
(sampling.py:518-660); here all per-step coefficients (alpha/sigma terms of
the posterior) are precomputed as [steps] tables and the model forward +
posterior update + fresh-noise injection run as one scan body — one compile,
zero host round-trips for the whole chain.

Self-conditioning state (previous prediction) is carried through the scan
as in the reference's chained cond_x/cond_edge_x (sampling.py:551-558).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    combined_position_feature_noise,
    gaussian_with_mask,
    symmetric_edge_noise,
)

__all__ = ["AncestralCoeffs", "ancestral_sample", "ancestral_sample_2d"]


@dataclasses.dataclass(frozen=True)
class AncestralCoeffs:
    """Per-step posterior coefficients for z_s | z_t, x0-pred or eps-pred."""

    t: jnp.ndarray  # [steps]
    noise_level: jnp.ndarray  # [steps] log snr at t
    coef_x: jnp.ndarray  # [steps] multiplier of current state
    coef_pred: jnp.ndarray  # [steps] multiplier of the model prediction
    sigma: jnp.ndarray  # [steps] posterior std

    @staticmethod
    def create(schedule, steps: int, pred_data: bool, eps: float = 1e-3):
        """Tables for the time grid linspace(T, eps, steps) with s shifted by
        one (last s = 0), matching sampling.py:163,523-545."""
        t = np.linspace(schedule.T, eps, steps, dtype=np.float64)
        s = np.concatenate([t[1:], np.zeros(1)])
        t_j = jnp.asarray(t, jnp.float32)
        s_j = jnp.asarray(s, jnp.float32)
        alpha_t, sigma_t = schedule.marginal_prob(t_j)
        alpha_s, sigma_s = schedule.marginal_prob(s_j)
        alpha_ts = alpha_t / alpha_s
        sigma2_ts = sigma_t**2 - alpha_ts**2 * sigma_s**2
        sigma = jnp.sqrt(sigma2_ts) * sigma_s / sigma_t
        if pred_data:
            coef_x = alpha_ts * sigma_s**2 / sigma_t**2
            coef_pred = alpha_s * sigma2_ts / sigma_t**2
        else:
            coef_x = 1.0 / alpha_ts
            coef_pred = -sigma2_ts / alpha_ts / sigma_t
        noise_level = jnp.log(alpha_t**2 / sigma_t**2)
        return AncestralCoeffs(t_j, noise_level, coef_x, coef_pred, sigma)


def ancestral_sample(
    model_fn: Callable,
    coeffs: AncestralCoeffs,
    key,
    z_init,
    edge_z_init,
    node_mask,
    edge_mask,
    context=None,
    self_cond: bool = True,
    cond_process_fn=None,
):
    """Run the full reverse chain; returns (x_mean, edge_x_mean).

    model_fn(t_vec, x, nm, em, edge_x, noise_level_vec, cond_x, cond_edge_x,
    cond_flag, context) -> (pred, edge_pred); params already bound.
    """
    b, n = z_init.shape[0], z_init.shape[1]
    feat_dim = z_init.shape[2] - 3
    edge_dim = edge_z_init.shape[-1]
    steps = coeffs.t.shape[0]
    if cond_process_fn is None:
        cond_process_fn = lambda cx, cex: (cx, cex)

    def body(carry, step_inputs):
        x, edge_x, cond_x, cond_edge_x, cond_flag, key, _, _ = carry
        t, noise_level, coef_x, coef_pred, sigma = step_inputs
        key, k_node, k_edge = jax.random.split(key, 3)

        t_vec = jnp.full((b,), t)
        nl_vec = jnp.full((b,), noise_level)
        pred, edge_pred = model_fn(
            t_vec, x, node_mask, edge_mask, edge_x, nl_vec,
            cond_x=cond_x, cond_edge_x=cond_edge_x, cond_flag=cond_flag,
            context=context,
        )
        if self_cond:
            cond_x, cond_edge_x = cond_process_fn(pred, edge_pred)
            cond_flag = jnp.asarray(1.0)

        x_mean = coef_x * x + coef_pred * pred
        edge_x_mean = coef_x * edge_x + coef_pred * edge_pred

        x = x_mean + sigma * combined_position_feature_noise(
            k_node, b, n, feat_dim, node_mask
        )
        edge_x = edge_x_mean + sigma * symmetric_edge_noise(
            k_edge, b, n, edge_dim, edge_mask
        )
        new_carry = (x, edge_x, cond_x, cond_edge_x, cond_flag, key, x_mean, edge_x_mean)
        return new_carry, None

    init = (
        z_init,
        edge_z_init,
        jnp.zeros_like(z_init),
        jnp.zeros_like(edge_z_init),
        jnp.asarray(0.0),
        key,
        jnp.zeros_like(z_init),
        jnp.zeros_like(edge_z_init),
    )
    xs = (coeffs.t, coeffs.noise_level, coeffs.coef_x, coeffs.coef_pred, coeffs.sigma)
    final_carry, _ = jax.lax.scan(body, init, xs)
    # the returned sample is the final-step posterior MEAN (sampling.py:591-596)
    return final_carry[6], final_carry[7]


def ancestral_sample_2d(
    model_fn: Callable,
    coeffs: AncestralCoeffs,
    key,
    z_init,
    edge_z_init,
    node_mask,
    edge_mask,
    context=None,
    self_cond: bool = True,
):
    """2D variant: iid node noise, no CoM projection (sampling.py:599-660)."""
    b, n = z_init.shape[0], z_init.shape[1]
    edge_dim = edge_z_init.shape[-1]

    def body(carry, step_inputs):
        x, edge_x, cond_x, cond_edge_x, cond_flag, key, _, _ = carry
        t, noise_level, coef_x, coef_pred, sigma = step_inputs
        key, k_node, k_edge = jax.random.split(key, 3)

        t_vec = jnp.full((b,), t)
        nl_vec = jnp.full((b,), noise_level)
        pred, edge_pred = model_fn(
            t_vec, x, node_mask, edge_mask, edge_x, nl_vec,
            cond_x=cond_x, cond_edge_x=cond_edge_x, cond_flag=cond_flag,
            context=context,
        )
        if self_cond:
            cond_x, cond_edge_x = pred, edge_pred
            cond_flag = jnp.asarray(1.0)

        x_mean = coef_x * x + coef_pred * pred
        edge_x_mean = coef_x * edge_x + coef_pred * edge_pred

        x = x_mean + sigma * gaussian_with_mask(k_node, x_mean.shape, node_mask)
        edge_x = edge_x_mean + sigma * symmetric_edge_noise(
            k_edge, b, n, edge_dim, edge_mask
        )
        new_carry = (x, edge_x, cond_x, cond_edge_x, cond_flag, key, x_mean, edge_x_mean)
        return new_carry, None

    init = (
        z_init,
        edge_z_init,
        jnp.zeros_like(z_init),
        jnp.zeros_like(edge_z_init),
        jnp.asarray(0.0),
        key,
        jnp.zeros_like(z_init),
        jnp.zeros_like(edge_z_init),
    )
    xs = (coeffs.t, coeffs.noise_level, coeffs.coef_x, coeffs.coef_pred, coeffs.sigma)
    final_carry, _ = jax.lax.scan(body, init, xs)
    return final_carry[6], final_carry[7]
