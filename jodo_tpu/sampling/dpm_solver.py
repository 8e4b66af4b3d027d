"""Hybrid DPM-Solver++ fast sampler, scan-compiled.

Re-design of the reference DPM_Solver_hybrid (mix_dpm_solver.py:16-376):
atom-type and edge channels advance with deterministic DPM-Solver++
data-prediction updates in half-logSNR space (singlestep orders 1-3,
multistep orders 1-2), while *positions* advance with stochastic ancestral
updates so they stay in the CoM-Gaussian subspace. Requires a
data-prediction model with self-conditioning (mix_dpm_solver.py:26-27).

All lambda-space coefficients depend only on the time grid, so they are
precomputed as [K, ...] tables on host and the whole chain is one
jax.lax.scan — K outer steps, `order` model calls per step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import com_free_gaussian

__all__ = ["DPMSolverCoeffs", "dpm_solver_sample"]


def _pos_ancestral_coeffs(schedule, t_from, t_to):
    """Ancestral posterior coefficients for the position sub-update
    (mix_dpm_solver.py:44-59)."""
    alpha_t, sigma_t = schedule.marginal_prob(jnp.asarray(t_from, jnp.float32))
    alpha_s, sigma_s = schedule.marginal_prob(jnp.asarray(t_to, jnp.float32))
    alpha_ts = alpha_t / alpha_s
    sigma2_ts = sigma_t**2 - alpha_ts**2 * sigma_s**2
    coef_x = alpha_ts * sigma_s**2 / sigma_t**2
    coef_pred = alpha_s * sigma2_ts / sigma_t**2
    sigma = jnp.sqrt(sigma2_ts) * sigma_s / sigma_t
    return np.asarray(coef_x), np.asarray(coef_pred), np.asarray(sigma)


@dataclasses.dataclass(frozen=True)
class DPMSolverCoeffs:
    """Stacked per-outer-step coefficient tables."""

    method: str
    order: int
    tables: dict  # name -> [K(,...)] jnp arrays

    @staticmethod
    def create(schedule, steps: int, order: int = 2, method: str = "singlestep_fixed"):
        t_0 = 1.0 / schedule.total_N
        t_T = schedule.T

        lam = lambda t: np.asarray(schedule.marginal_lambda(jnp.asarray(t, jnp.float32)))
        log_a = lambda t: np.asarray(
            schedule.marginal_log_mean_coeff(jnp.asarray(t, jnp.float32))
        )
        sig = lambda t: np.asarray(schedule.marginal_std(jnp.asarray(t, jnp.float32)))
        nl = lambda t: np.asarray(schedule.log_snr(jnp.asarray(t, jnp.float32)))

        if method == "singlestep_fixed":
            k_outer = steps // order
            outer = np.linspace(t_T, t_0, k_outer + 1)
            rows: dict = {k: [] for k in [
                "t0", "s1", "s2", "nl0", "nl1", "nl2",
                "c1_x", "c1_p", "c2_x", "c2_p", "c2_r",
                "c3_x", "c3_p", "c3_r",
                "pa1", "pa2", "pa3", "last",
            ]}
            for i in range(k_outer):
                t0, t1 = outer[i], outer[i + 1]
                inner = np.linspace(t0, t1, order + 1)
                lam_in = lam(inner)
                h = lam_in[-1] - lam_in[0]
                last = i == k_outer - 1

                if order == 1:
                    s1 = s2 = t1
                    phi_1 = np.expm1(-h)
                    rows["c1_x"].append(sig(t1) / sig(t0))
                    rows["c1_p"].append(np.exp(log_a(t1)) * phi_1)
                    rows["c2_x"].append(0.0)
                    rows["c2_p"].append(0.0)
                    rows["c2_r"].append(0.0)
                    rows["c3_x"].append(0.0)
                    rows["c3_p"].append(0.0)
                    rows["c3_r"].append(0.0)
                    rows["pa1"].append(_pos_ancestral_coeffs(schedule, t0, t1))
                    rows["pa2"].append((0.0, 0.0, 0.0))
                    rows["pa3"].append((0.0, 0.0, 0.0))
                elif order == 2:
                    r1 = (lam_in[1] - lam_in[0]) / h
                    s1 = float(
                        np.asarray(
                            schedule.inverse_lambda(
                                jnp.asarray(lam_in[0] + r1 * h, jnp.float32)
                            )
                        )
                    )
                    s2 = t1
                    phi_11 = np.expm1(-r1 * h)
                    phi_1 = np.expm1(-h)
                    a_s1, a_1 = np.exp(log_a(s1)), np.exp(log_a(t1))
                    rows["c1_x"].append(sig(s1) / sig(t0))
                    rows["c1_p"].append(a_s1 * phi_11)
                    rows["c2_x"].append(sig(t1) / sig(t0))
                    rows["c2_p"].append(a_1 * phi_1)
                    rows["c2_r"].append((0.5 / r1) * a_1 * phi_1)
                    rows["c3_x"].append(0.0)
                    rows["c3_p"].append(0.0)
                    rows["c3_r"].append(0.0)
                    rows["pa1"].append(_pos_ancestral_coeffs(schedule, t0, s1))
                    rows["pa2"].append(_pos_ancestral_coeffs(schedule, s1, t1))
                    rows["pa3"].append((0.0, 0.0, 0.0))
                elif order == 3:
                    r1 = (lam_in[1] - lam_in[0]) / h
                    r2 = (lam_in[2] - lam_in[0]) / h
                    s1 = float(np.asarray(schedule.inverse_lambda(
                        jnp.asarray(lam_in[0] + r1 * h, jnp.float32))))
                    s2 = float(np.asarray(schedule.inverse_lambda(
                        jnp.asarray(lam_in[0] + r2 * h, jnp.float32))))
                    phi_11 = np.expm1(-r1 * h)
                    phi_12 = np.expm1(-r2 * h)
                    phi_1 = np.expm1(-h)
                    phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
                    phi_2 = phi_1 / h + 1.0
                    a_s1, a_s2, a_1 = np.exp(log_a(s1)), np.exp(log_a(s2)), np.exp(log_a(t1))
                    rows["c1_x"].append(sig(s1) / sig(t0))
                    rows["c1_p"].append(a_s1 * phi_11)
                    rows["c2_x"].append(sig(s2) / sig(t0))
                    rows["c2_p"].append(a_s2 * phi_12)
                    rows["c2_r"].append(-(r2 / r1) * a_s2 * phi_22)
                    rows["c3_x"].append(sig(t1) / sig(t0))
                    rows["c3_p"].append(a_1 * phi_1)
                    rows["c3_r"].append(-(1.0 / r2) * a_1 * phi_2)
                    rows["pa1"].append(_pos_ancestral_coeffs(schedule, t0, s1))
                    rows["pa2"].append(_pos_ancestral_coeffs(schedule, s1, s2))
                    rows["pa3"].append(_pos_ancestral_coeffs(schedule, s2, t1))
                else:
                    raise ValueError("Solver order Error")

                rows["t0"].append(t0)
                rows["s1"].append(s1)
                rows["s2"].append(s2)
                rows["nl0"].append(nl(t0))
                rows["nl1"].append(nl(s1))
                rows["nl2"].append(nl(s2))
                rows["last"].append(float(last))

            tables = {
                k: jnp.asarray(np.asarray(v), jnp.float32) for k, v in rows.items()
            }
            return DPMSolverCoeffs(method, order, tables)

        if method == "multistep":
            assert order in (1, 2), "multistep supports orders 1-2"
            ts = np.linspace(t_T, t_0, steps + 1)
            lam_ts = lam(ts)
            rows = {k: [] for k in ["t", "nl", "c_x", "c_p", "c_r", "pa", "last", "first"]}
            for step in range(1, steps + 1):
                t_prev, t = ts[step - 1], ts[step]
                h = lam_ts[step] - lam_ts[step - 1]
                phi_1 = np.expm1(-h)
                a_t = np.exp(log_a(t))
                first_order = (order == 1) or (step == 1)
                if first_order:
                    r0 = 1.0
                    c_r = 0.0
                else:
                    h_0 = lam_ts[step - 1] - lam_ts[step - 2]
                    r0 = h_0 / h
                    c_r = 0.5 * a_t * phi_1 / r0
                rows["t"].append(t)
                rows["nl"].append(nl(t))
                rows["c_x"].append(sig(t) / sig(t_prev))
                rows["c_p"].append(a_t * phi_1)
                rows["c_r"].append(c_r)
                rows["pa"].append(_pos_ancestral_coeffs(schedule, t_prev, t))
                rows["last"].append(float(step == steps))
                rows["first"].append(float(first_order))
            rows["nl_init"] = [nl(ts[0])]
            rows["t_init"] = [ts[0]]
            tables = {
                k: jnp.asarray(np.asarray(v), jnp.float32) for k, v in rows.items()
            }
            return DPMSolverCoeffs(method, order, tables)

        raise ValueError(f"Unknown dpm solver method {method}")


def _split(x):
    return x[:, :, :3], x[:, :, 3:]


def _pos_update(pos, pos_pred, pa, node_mask, key, last):
    """Stochastic ancestral position sub-update; noise suppressed on the
    final sub-step (mix_dpm_solver.py:52-58)."""
    coef_x, coef_pred, sigma = pa[0], pa[1], pa[2]
    mean = coef_x * pos + coef_pred * pos_pred
    noise = com_free_gaussian(key, pos.shape, node_mask)
    return mean + jnp.where(last > 0, 0.0, sigma) * noise


def dpm_solver_sample(
    model_fn: Callable,
    coeffs: DPMSolverCoeffs,
    key,
    z_init,
    edge_z_init,
    node_mask,
    edge_mask,
    context=None,
    cond_process_fn=None,
):
    """Run the hybrid solver chain; returns (x, edge_x) at t_0."""
    b = z_init.shape[0]
    if cond_process_fn is None:
        cond_process_fn = lambda cx, cex: (cx, cex)
    tbl = coeffs.tables

    def call_model(x, edge_x, t, nl_val, cond_x, cond_edge_x, cond_flag):
        t_vec = jnp.full((b,), t)
        nl_vec = jnp.full((b,), nl_val)
        pred, edge_pred = model_fn(
            t_vec, x, node_mask, edge_mask, edge_x, nl_vec,
            cond_x=cond_x, cond_edge_x=cond_edge_x, cond_flag=cond_flag,
            context=context,
        )
        # self-cond state := latest prediction (mix_dpm_solver.py:296-302)
        cx, cex = cond_process_fn(pred, edge_pred)
        return pred, edge_pred, cx, cex, jnp.asarray(1.0)

    if coeffs.method == "singlestep_fixed":
        order = coeffs.order

        def body(carry, row):
            x, edge_x, cond_x, cond_edge_x, cond_flag, key = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            pos, atom = _split(x)

            pred0, epred0, cond_x, cond_edge_x, cond_flag = call_model(
                x, edge_x, row["t0"], row["nl0"], cond_x, cond_edge_x, cond_flag
            )
            pos_p0, atom_p0 = _split(pred0)

            if order == 1:
                atom1 = row["c1_x"] * atom - row["c1_p"] * atom_p0
                edge1 = row["c1_x"] * edge_x - row["c1_p"] * epred0
                pos1 = _pos_update(pos, pos_p0, row["pa1"], node_mask, k1, row["last"])
                new = (jnp.concatenate([pos1, atom1], -1), edge1)
            elif order == 2:
                atom_s1 = row["c1_x"] * atom - row["c1_p"] * atom_p0
                edge_s1 = row["c1_x"] * edge_x - row["c1_p"] * epred0
                pos_s1 = _pos_update(pos, pos_p0, row["pa1"], node_mask, k1, 0.0)
                x_s1 = jnp.concatenate([pos_s1, atom_s1], -1)

                pred1, epred1, cond_x, cond_edge_x, cond_flag = call_model(
                    x_s1, edge_s1, row["s1"], row["nl1"], cond_x, cond_edge_x, cond_flag
                )
                pos_p1, atom_p1 = _split(pred1)

                atom1 = (
                    row["c2_x"] * atom
                    - row["c2_p"] * atom_p0
                    - row["c2_r"] * (atom_p1 - atom_p0)
                )
                edge1 = (
                    row["c2_x"] * edge_x
                    - row["c2_p"] * epred0
                    - row["c2_r"] * (epred1 - epred0)
                )
                pos1 = _pos_update(pos_s1, pos_p1, row["pa2"], node_mask, k2, row["last"])
                new = (jnp.concatenate([pos1, atom1], -1), edge1)
            else:  # order 3
                atom_s1 = row["c1_x"] * atom - row["c1_p"] * atom_p0
                edge_s1 = row["c1_x"] * edge_x - row["c1_p"] * epred0
                pos_s1 = _pos_update(pos, pos_p0, row["pa1"], node_mask, k1, 0.0)
                x_s1 = jnp.concatenate([pos_s1, atom_s1], -1)

                pred1, epred1, cond_x, cond_edge_x, cond_flag = call_model(
                    x_s1, edge_s1, row["s1"], row["nl1"], cond_x, cond_edge_x, cond_flag
                )
                pos_p1, atom_p1 = _split(pred1)

                atom_s2 = (
                    row["c2_x"] * atom
                    - row["c2_p"] * atom_p0
                    - row["c2_r"] * (atom_p1 - atom_p0)
                )
                edge_s2 = (
                    row["c2_x"] * edge_x
                    - row["c2_p"] * epred0
                    - row["c2_r"] * (epred1 - epred0)
                )
                pos_s2 = _pos_update(pos_s1, pos_p1, row["pa2"], node_mask, k2, 0.0)
                x_s2 = jnp.concatenate([pos_s2, atom_s2], -1)

                pred2, epred2, cond_x, cond_edge_x, cond_flag = call_model(
                    x_s2, edge_s2, row["s2"], row["nl2"], cond_x, cond_edge_x, cond_flag
                )
                pos_p2, atom_p2 = _split(pred2)

                atom1 = (
                    row["c3_x"] * atom
                    - row["c3_p"] * atom_p0
                    - row["c3_r"] * (atom_p2 - atom_p0)
                )
                edge1 = (
                    row["c3_x"] * edge_x
                    - row["c3_p"] * epred0
                    - row["c3_r"] * (epred2 - epred0)
                )
                pos1 = _pos_update(pos_s2, pos_p2, row["pa3"], node_mask, k3, row["last"])
                new = (jnp.concatenate([pos1, atom1], -1), edge1)

            return (new[0], new[1], cond_x, cond_edge_x, cond_flag, key), None

        keys = ["t0", "s1", "s2", "nl0", "nl1", "nl2", "c1_x", "c1_p",
                "c2_x", "c2_p", "c2_r", "c3_x", "c3_p", "c3_r",
                "pa1", "pa2", "pa3", "last"]
        rows = {k: tbl[k] for k in keys}
        init = (
            z_init, edge_z_init,
            jnp.zeros_like(z_init), jnp.zeros_like(edge_z_init),
            jnp.asarray(0.0), key,
        )
        carry, _ = jax.lax.scan(
            lambda c, r: body(c, r), init, rows
        )
        return carry[0], carry[1]

    # multistep
    def body_ms(carry, row):
        x, edge_x, cond_x, cond_edge_x, cond_flag, prev_atom_p, prev_edge_p, \
            atom_p, edge_p, pos_p, key = carry
        key, k1 = jax.random.split(key)
        pos, atom = _split(x)

        # second-order difference term D1 (mix_dpm_solver.py:253-258);
        # zeroed on first-order steps
        d_atom = jnp.where(row["first"] > 0, 0.0, atom_p - prev_atom_p)
        d_edge = jnp.where(row["first"] > 0, 0.0, edge_p - prev_edge_p)

        atom1 = row["c_x"] * atom - row["c_p"] * atom_p - row["c_r"] * d_atom
        edge1 = row["c_x"] * edge_x - row["c_p"] * edge_p - row["c_r"] * d_edge
        pos1 = _pos_update(pos, pos_p, row["pa"], node_mask, k1, row["last"])
        x1 = jnp.concatenate([pos1, atom1], -1)

        pred, epred, cond_x, cond_edge_x, cond_flag = call_model(
            x1, edge1, row["t"], row["nl"], cond_x, cond_edge_x, cond_flag
        )
        pos_p_new, atom_p_new = _split(pred)
        new_carry = (
            x1, edge1, cond_x, cond_edge_x, cond_flag,
            atom_p, edge_p, atom_p_new, epred, pos_p_new, key,
        )
        return new_carry, None

    # initial model evaluation at t_T (mix_dpm_solver.py:341-345)
    pred0, epred0, cond_x, cond_edge_x, cond_flag = call_model(
        z_init, edge_z_init, tbl["t_init"][0], tbl["nl_init"][0],
        jnp.zeros_like(z_init), jnp.zeros_like(edge_z_init), jnp.asarray(0.0),
    )
    pos_p0, atom_p0 = _split(pred0)
    init = (
        z_init, edge_z_init, cond_x, cond_edge_x, cond_flag,
        jnp.zeros_like(atom_p0), jnp.zeros_like(epred0),
        atom_p0, epred0, pos_p0, key,
    )
    rows = {k: tbl[k] for k in ["t", "nl", "c_x", "c_p", "c_r", "pa", "last", "first"]}
    carry, _ = jax.lax.scan(body_ms, init, rows)
    return carry[0], carry[1]
