"""Continuous-time VP-SDE noise schedules, pure-jnp.

Functionally equivalent to the reference `NoiseScheduleVP`
(reference: diffusion/noise_schedule.py:6-122) but re-designed for XLA:
every method is a pure function of `t` so it can be vmapped, scanned and
folded into jit-compiled samplers; discrete schedules carry their keypoint
tables as device constants and use a branch-free piecewise-linear
interpolation (reference: diffusion/noise_schedule.py:129-168).

Supported schedules: 'linear', 'cosine', 'discrete_poly', 'discrete'.
The reference's `betas` branch (noise_schedule.py:30) has a NameError bug
(`beta` vs `betas`); here the betas path is implemented correctly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["NoiseSchedule", "polynomial_alphas2", "interp_lin"]


def polynomial_alphas2(time_steps: int, s: float = 1e-4, power: float = 2.0) -> np.ndarray:
    """Polynomial alpha_bar^2 schedule (E3-Diffusion style).

    Matches reference get_polynomial_schedule (noise_schedule.py:184-201).
    Returns alphas2[1:] with len == time_steps.
    """
    steps = time_steps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=0.001, a_max=1.0)
    alphas2 = np.cumprod(alphas_step, axis=0)
    precision = 1 - 2 * s
    alphas2 = precision * alphas2 + s
    return alphas2[1:]


def interp_lin(x: jnp.ndarray, xp: jnp.ndarray, yp: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolation with linear extrapolation at both ends.

    `xp` must be strictly increasing 1-D. Unlike jnp.interp (which clamps),
    points outside [xp[0], xp[-1]] are extrapolated with the edge segments,
    matching reference interpolate_fn (noise_schedule.py:129-168).
    """
    x = jnp.asarray(x)
    k = xp.shape[0]
    # segment index: xp[i] <= x < xp[i+1]; clamp to [0, k-2]
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, k - 2)
    x0 = xp[idx]
    x1 = xp[idx + 1]
    y0 = yp[idx]
    y1 = yp[idx + 1]
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Forward VP-SDE: z_t = alpha(t) x + sigma(t) eps.

    Construct once (host side); all methods are jit-safe pure functions.
    """

    schedule: str = "cosine"
    beta_0: float = 0.1
    beta_1: float = 20.0
    cosine_s: float = 0.008
    total_N: int = 1000
    T: float = 1.0
    # discrete-schedule tables (None for continuous schedules)
    t_array: Optional[jnp.ndarray] = None
    log_alpha_array: Optional[jnp.ndarray] = None

    @staticmethod
    def create(
        schedule: str = "cosine",
        continuous_beta_0: float = 0.1,
        continuous_beta_1: float = 20.0,
        betas: Optional[np.ndarray] = None,
        alphas_cumprod: Optional[np.ndarray] = None,
    ) -> "NoiseSchedule":
        if schedule not in ("discrete", "linear", "cosine", "discrete_poly"):
            raise ValueError(f"Unsupported noise schedule {schedule}")

        if "discrete" in schedule:
            if schedule == "discrete_poly":
                a2 = polynomial_alphas2(1000, power=2)
                log_alphas = 0.5 * np.log(a2)
            elif betas is not None:
                log_alphas = 0.5 * np.cumsum(np.log(1.0 - np.asarray(betas)))
            else:
                assert alphas_cumprod is not None, "discrete schedule needs betas or alphas_cumprod"
                log_alphas = 0.5 * np.log(np.asarray(alphas_cumprod))
            total_n = len(log_alphas)
            t_array = np.linspace(0.0, 1.0, total_n + 1)[1:]
            return NoiseSchedule(
                schedule=schedule,
                total_N=total_n,
                T=1.0,
                t_array=jnp.asarray(t_array, dtype=jnp.float32),
                log_alpha_array=jnp.asarray(log_alphas, dtype=jnp.float32),
            )

        # cosine T=0.9946 avoids the log-SNR blow-up near t=1
        # (reference: noise_schedule.py:48-53)
        t_max = 0.9946 if schedule == "cosine" else 1.0
        return NoiseSchedule(
            schedule=schedule,
            beta_0=continuous_beta_0,
            beta_1=continuous_beta_1,
            total_N=1000,
            T=t_max,
        )

    # -- log alpha(t) ------------------------------------------------------
    @property
    def _cosine_log_alpha_0(self) -> float:
        return math.log(math.cos(self.cosine_s / (1.0 + self.cosine_s) * math.pi / 2.0))

    def marginal_log_mean_coeff(self, t: jnp.ndarray) -> jnp.ndarray:
        """log(alpha_t) for t in [0, T]."""
        t = jnp.asarray(t, dtype=jnp.float32)
        if "discrete" in self.schedule:
            return interp_lin(t, self.t_array, self.log_alpha_array)
        if self.schedule == "linear":
            return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        # cosine
        s = self.cosine_s
        return jnp.log(jnp.cos((t + s) / (1.0 + s) * jnp.pi / 2.0)) - self._cosine_log_alpha_0

    def marginal_alpha(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_prob(self, t: jnp.ndarray):
        """(alpha_t, sigma_t)."""
        log_a = self.marginal_log_mean_coeff(t)
        return jnp.exp(log_a), jnp.sqrt(1.0 - jnp.exp(2.0 * log_a))

    def marginal_lambda(self, t: jnp.ndarray) -> jnp.ndarray:
        """Half log-SNR: lambda_t = log(alpha_t) - log(sigma_t)."""
        log_a = self.marginal_log_mean_coeff(t)
        log_sigma = 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_a))
        return log_a - log_sigma

    def inverse_lambda(self, lamb: jnp.ndarray) -> jnp.ndarray:
        """t such that marginal_lambda(t) == lamb."""
        lamb = jnp.asarray(lamb, dtype=jnp.float32)
        if self.schedule == "linear":
            tmp = 2.0 * (self.beta_1 - self.beta_0) * jnp.logaddexp(-2.0 * lamb, 0.0)
            delta = self.beta_0**2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        if "discrete" in self.schedule:
            log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
            # log_alpha_array decreases with t: flip to get increasing xp
            return interp_lin(
                log_alpha, jnp.flip(self.log_alpha_array), jnp.flip(self.t_array)
            )
        # cosine
        log_alpha = -0.5 * jnp.logaddexp(-2.0 * lamb, 0.0)
        s = self.cosine_s
        return (
            jnp.arccos(jnp.exp(log_alpha + self._cosine_log_alpha_0))
            * 2.0
            * (1.0 + s)
            / jnp.pi
            - s
        )

    def log_snr(self, t: jnp.ndarray) -> jnp.ndarray:
        """Noise level conditioning signal log(alpha_t^2 / sigma_t^2)."""
        alpha_t, sigma_t = self.marginal_prob(t)
        return jnp.log(alpha_t**2 / sigma_t**2)
