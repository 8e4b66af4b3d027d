"""Diffusion training losses, fully on-device and key-threaded.

Re-design of the reference loss closures (losses.py:128-385): everything —
t sampling, forward diffusion, Kabsch alignment, the 50%% self-conditioning
teacher pass (lax.cond + stop_gradient), and the weighted MSEs — lives in a
single traced function so the whole train step compiles to one XLA program.

Batch convention: dict with
  xh        [B, N, 3+C]  (pos ++ scaled atom one-hot ++ scaled charge)
            or [B, N, C] for 2D losses
  edge_x    [B, N, N, E] scaled dense edge features (joint/2D losses)
  node_mask [B, N]
  edge_mask [B, N, N]
  context   [B, P] (optional, conditional)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ops import (
    align_noise,
    align_positions,
    combined_position_feature_noise,
    gaussian_with_mask,
    symmetric_edge_noise,
)

T_EPS = 1e-5


def parse_loss_weights(s) -> tuple:
    if isinstance(s, str):
        return tuple(float(x) for x in s.split(","))
    return tuple(s)


def make_self_cond_clamp(config):
    """'clamp' post-process of self-cond predictions (utils.py:108-150)."""
    from .ops.scalers import parse_normalize_factors

    process_type = config.model.self_cond_type
    if process_type == "ori":
        return lambda cond_x, cond_edge_x: (cond_x, cond_edge_x)

    atom_types = config.data.atom_types
    include_fc = config.model.include_fc_charge
    _, atom_norm, fc_norm, edge_norm = parse_normalize_factors(
        config.model.normalize_factors
    )
    atom_scale = jnp.asarray([0.0, 1.0])
    edge_scale = jnp.asarray([0.0, 1.0])
    fc_scale = jnp.asarray(list(config.data.fc_scale))
    if config.data.centered:
        atom_scale = atom_scale * 2.0 - 1.0
        edge_scale = edge_scale * 2.0 - 1.0
    atom_scale = atom_scale / atom_norm
    fc_scale = fc_scale / fc_norm
    edge_scale = edge_scale / edge_norm

    def clamp(cond_x, cond_edge_x):
        atom_x = jnp.clip(cond_x[:, :, 3 : 3 + atom_types], atom_scale[0], atom_scale[1])
        cond_x = cond_x.at[:, :, 3 : 3 + atom_types].set(atom_x)
        if include_fc:
            fc = jnp.clip(cond_x[:, :, -1:], fc_scale[0], fc_scale[1])
            cond_x = cond_x.at[:, :, -1:].set(fc)
        cond_edge_x = jnp.clip(cond_edge_x, edge_scale[0], edge_scale[1])
        return cond_x, cond_edge_x

    return clamp


def _self_cond_forward(apply_fn, key, t, z_t, nm, em, edge_z_t, noise_level, context,
                       cond_process_fn, dropout_key):
    """50% chance: run a stop-gradient teacher pass to produce self-cond
    inputs (losses.py:332-341), via lax.cond so only one branch executes."""
    use_cond = jax.random.bernoulli(key)

    def teacher(_):
        pred, edge_pred = apply_fn(
            t, z_t, nm, em, edge_z_t, noise_level,
            cond_x=None, cond_edge_x=None, cond_flag=0.0, context=context,
            dropout_key=dropout_key,
        )
        pred = jax.lax.stop_gradient(pred)
        edge_pred = jax.lax.stop_gradient(edge_pred)
        return (*cond_process_fn(pred, edge_pred), jnp.asarray(1.0))

    def no_teacher(_):
        return (jnp.zeros_like(z_t), jnp.zeros_like(edge_z_t), jnp.asarray(0.0))

    return jax.lax.cond(use_cond, teacher, no_teacher, None)


def make_graph_loss_fn(schedule, config) -> Callable:
    """Joint pos+atom+edge loss (reference get_sde_graph_loss_fn,
    losses.py:286-385). Returns loss_fn(apply_fn, key, batch) -> scalar.

    `apply_fn(t, xh, nm, em, edge_x, noise_level, cond_x, cond_edge_x,
    cond_flag, context, dropout_key)` wraps model.apply with params bound.
    """
    pred_data = config.model.pred_data
    reduce_mean = config.training.reduce_mean
    noise_align = config.model.noise_align
    self_cond = config.model.self_cond
    w_pos, w_atom, w_edge = parse_loss_weights(config.model.loss_weights)
    cond_process_fn = make_self_cond_clamp(config)

    def loss_fn(apply_fn, key, batch):
        xh = batch["xh"]
        edge_x = batch["edge_x"]
        nm = batch["node_mask"]
        em = batch["edge_mask"]
        context = batch.get("context")
        b, n, _ = xh.shape
        n_nodes = jnp.sum(nm, axis=-1)

        k_t, k_node, k_edge, k_sc, k_do1 = jax.random.split(key, 5)
        t = jax.random.uniform(k_t, (b,)) * (1.0 - T_EPS) + T_EPS
        alpha_t, sigma_t = schedule.marginal_prob(t)

        noise = combined_position_feature_noise(k_node, b, n, xh.shape[2] - 3, nm)
        edge_noise = symmetric_edge_noise(k_edge, b, n, edge_x.shape[-1], em)

        z_t = alpha_t[:, None, None] * xh + sigma_t[:, None, None] * noise
        edge_z_t = (
            alpha_t[:, None, None, None] * edge_x
            + sigma_t[:, None, None, None] * edge_noise
        )

        if noise_align:
            if pred_data:
                align_pos = jax.lax.stop_gradient(align_positions(z_t, xh))
            else:
                noise = jax.lax.stop_gradient(
                    align_noise(z_t, xh, alpha_t, sigma_t, noise, nm)
                )
                align_pos = xh[:, :, :3]
        else:
            align_pos = xh[:, :, :3]

        noise_level = jnp.log(alpha_t**2 / sigma_t**2)

        if self_cond:
            cond_x, cond_edge_x, cond_flag = _self_cond_forward(
                apply_fn, k_sc, t, z_t, nm, em, edge_z_t, noise_level, context,
                cond_process_fn, k_do1,
            )
        else:
            cond_x = jnp.zeros_like(z_t)
            cond_edge_x = jnp.zeros_like(edge_z_t)
            cond_flag = jnp.asarray(0.0)

        pred, edge_pred = apply_fn(
            t, z_t, nm, em, edge_z_t, noise_level,
            cond_x=cond_x, cond_edge_x=cond_edge_x, cond_flag=cond_flag,
            context=context, dropout_key=k_do1,
        )

        if pred_data:
            l_pos = jnp.sum(jnp.mean((pred[:, :, :3] - align_pos) ** 2, axis=-1), axis=-1)
            l_atom = jnp.sum(jnp.mean((pred[:, :, 3:] - xh[:, :, 3:]) ** 2, axis=-1), axis=-1)
            l_edge = jnp.sum(
                jnp.mean((edge_x - edge_pred) ** 2, axis=-1).reshape(b, -1), axis=-1
            )
        else:
            d_node = (noise - pred) ** 2
            l_pos = jnp.sum(jnp.mean(d_node[:, :, :3], axis=-1), axis=-1)
            l_atom = jnp.sum(jnp.mean(d_node[:, :, 3:], axis=-1), axis=-1)
            l_edge = jnp.sum(
                jnp.mean((edge_noise - edge_pred) ** 2, axis=-1).reshape(b, -1), axis=-1
            )

        if reduce_mean:
            l_pos = l_pos / n_nodes
            l_atom = l_atom / n_nodes
            l_edge = l_edge / (jnp.sum(em.reshape(b, -1), axis=-1) + 1e-8)

        losses = w_pos * l_pos + w_atom * l_atom + w_edge * l_edge
        if pred_data:
            losses = jnp.sqrt(alpha_t / sigma_t) * losses
        return jnp.mean(losses)

    return loss_fn


def make_2d_loss_fn(schedule, config) -> Callable:
    """Atom+edge loss for 2D graphs (reference get_sde_2D_loss_fn,
    losses.py:210-283)."""
    pred_data = config.model.pred_data
    reduce_mean = config.training.reduce_mean
    self_cond = config.model.self_cond
    _, w_atom, w_edge = parse_loss_weights(config.model.loss_weights)
    cond_process_fn = make_self_cond_clamp(config)

    def loss_fn(apply_fn, key, batch):
        xh = batch["xh"]  # [B, N, C] (no positions)
        edge_x = batch["edge_x"]
        nm = batch["node_mask"]
        em = batch["edge_mask"]
        context = batch.get("context")
        b, n, _ = xh.shape
        n_nodes = jnp.sum(nm, axis=-1)

        k_t, k_node, k_edge, k_sc, k_do = jax.random.split(key, 5)
        t = jax.random.uniform(k_t, (b,)) * (1.0 - T_EPS) + T_EPS
        alpha_t, sigma_t = schedule.marginal_prob(t)

        noise = gaussian_with_mask(k_node, xh.shape, nm)
        edge_noise = symmetric_edge_noise(k_edge, b, n, edge_x.shape[-1], em)

        z_t = alpha_t[:, None, None] * xh + sigma_t[:, None, None] * noise
        edge_z_t = (
            alpha_t[:, None, None, None] * edge_x
            + sigma_t[:, None, None, None] * edge_noise
        )
        noise_level = jnp.log(alpha_t**2 / sigma_t**2)

        if self_cond:
            cond_x, cond_edge_x, cond_flag = _self_cond_forward(
                apply_fn, k_sc, t, z_t, nm, em, edge_z_t, noise_level, context,
                cond_process_fn, k_do,
            )
        else:
            cond_x = jnp.zeros_like(z_t)
            cond_edge_x = jnp.zeros_like(edge_z_t)
            cond_flag = jnp.asarray(0.0)

        pred, edge_pred = apply_fn(
            t, z_t, nm, em, edge_z_t, noise_level,
            cond_x=cond_x, cond_edge_x=cond_edge_x, cond_flag=cond_flag,
            context=context, dropout_key=k_do,
        )

        if pred_data:
            l_atom = jnp.sum(jnp.mean((pred - xh) ** 2, axis=-1), axis=-1)
            l_edge = jnp.sum(
                jnp.mean((edge_x - edge_pred) ** 2, axis=-1).reshape(b, -1), axis=-1
            )
        else:
            l_atom = jnp.sum(jnp.mean((noise - pred) ** 2, axis=-1), axis=-1)
            l_edge = jnp.sum(
                jnp.mean((edge_noise - edge_pred) ** 2, axis=-1).reshape(b, -1), axis=-1
            )

        if reduce_mean:
            l_atom = l_atom / n_nodes
            l_edge = l_edge / (jnp.sum(em.reshape(b, -1), axis=-1) + 1e-8)

        losses = w_atom * l_atom + w_edge * l_edge
        if pred_data:
            losses = jnp.sqrt(alpha_t / sigma_t) * losses
        return jnp.mean(losses)

    return loss_fn


def make_node_loss_fn(schedule, config) -> Callable:
    """Positions+atom-types only (no edges; reference get_sde_node_loss_fn,
    losses.py:128-207)."""
    pred_data = config.model.pred_data
    reduce_mean = config.training.reduce_mean
    noise_align = config.model.noise_align
    self_cond = config.model.self_cond
    weights = parse_loss_weights(config.model.loss_weights)
    w_pos, w_atom = weights[0], weights[1]

    def loss_fn(apply_fn, key, batch):
        xh = batch["xh"]
        nm = batch["node_mask"]
        em = batch["edge_mask"]
        b, n, _ = xh.shape
        n_nodes = jnp.sum(nm, axis=-1)

        k_t, k_node, k_sc, k_do = jax.random.split(key, 4)
        t = jax.random.uniform(k_t, (b,)) * (1.0 - T_EPS) + T_EPS
        alpha_t, sigma_t = schedule.marginal_prob(t)
        noise = combined_position_feature_noise(k_node, b, n, xh.shape[2] - 3, nm)
        z_t = alpha_t[:, None, None] * xh + sigma_t[:, None, None] * noise

        if noise_align:
            if pred_data:
                align_pos = jax.lax.stop_gradient(align_positions(z_t, xh))
            else:
                noise = jax.lax.stop_gradient(
                    align_noise(z_t, xh, alpha_t, sigma_t, noise, nm)
                )
                align_pos = xh[:, :, :3]
        else:
            align_pos = xh[:, :, :3]

        noise_level = jnp.log(alpha_t**2 / sigma_t**2)

        if self_cond:
            use_cond = jax.random.bernoulli(k_sc)

            def teacher(_):
                p = apply_fn(
                    t, z_t, nm, em, None, noise_level,
                    cond_x=None, cond_edge_x=None, cond_flag=0.0, context=None,
                    dropout_key=k_do,
                )
                return jax.lax.stop_gradient(p), jnp.asarray(1.0)

            cond_x, cond_flag = jax.lax.cond(
                use_cond, teacher, lambda _: (jnp.zeros_like(z_t), jnp.asarray(0.0)), None
            )
        else:
            cond_x, cond_flag = jnp.zeros_like(z_t), jnp.asarray(0.0)

        pred = apply_fn(
            t, z_t, nm, em, None, noise_level,
            cond_x=cond_x, cond_edge_x=None, cond_flag=cond_flag, context=None,
            dropout_key=k_do,
        )

        if pred_data:
            l_pos = jnp.sum(jnp.mean((pred[:, :, :3] - align_pos) ** 2, axis=-1), axis=-1)
            l_atom = jnp.sum(jnp.mean((pred[:, :, 3:] - xh[:, :, 3:]) ** 2, axis=-1), axis=-1)
        else:
            d = (noise - pred) ** 2
            l_pos = jnp.sum(jnp.mean(d[:, :, :3], axis=-1), axis=-1)
            l_atom = jnp.sum(jnp.mean(d[:, :, 3:], axis=-1), axis=-1)

        if reduce_mean:
            l_pos = l_pos / n_nodes
            l_atom = l_atom / n_nodes

        losses = w_pos * l_pos + w_atom * l_atom
        if pred_data:
            losses = jnp.sqrt(alpha_t / sigma_t) * losses
        return jnp.mean(losses)

    return loss_fn


def make_loss_fn(schedule, config) -> Callable:
    """Dispatch on pred_edge/only_2D (reference get_step_fn, losses.py:97-104)."""
    if config.pred_edge:
        if config.only_2D:
            return make_2d_loss_fn(schedule, config)
        return make_graph_loss_fn(schedule, config)
    return make_node_loss_fn(schedule, config)
