"""Noise-schedule math vs closed forms and inverse consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from jodo_tpu.diffusion import NoiseSchedule, interp_lin, polynomial_alphas2


@pytest.mark.parametrize("name", ["linear", "cosine", "discrete_poly"])
def test_alpha_sigma_unit_circle(name):
    sch = NoiseSchedule.create(name)
    t = jnp.linspace(1e-5, sch.T, 50)
    a, s = sch.marginal_prob(t)
    np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, atol=1e-5)
    # alpha decreases, sigma increases
    assert np.all(np.diff(np.asarray(a)) < 1e-7)
    assert np.all(np.diff(np.asarray(s)) > -1e-7)


def test_linear_closed_form():
    sch = NoiseSchedule.create("linear", 0.1, 20.0)
    t = jnp.asarray([0.1, 0.5, 0.9])
    expected_log_alpha = -0.25 * t**2 * (20.0 - 0.1) - 0.5 * t * 0.1
    np.testing.assert_allclose(
        np.asarray(sch.marginal_log_mean_coeff(t)), np.asarray(expected_log_alpha), rtol=1e-6
    )


def test_cosine_t0_is_identity():
    sch = NoiseSchedule.create("cosine")
    a, s = sch.marginal_prob(jnp.asarray(0.0))
    assert abs(float(a) - 1.0) < 1e-6
    assert float(s) < 1e-3


@pytest.mark.parametrize("name", ["linear", "cosine", "discrete_poly"])
def test_inverse_lambda_roundtrip(name):
    sch = NoiseSchedule.create(name)
    t = jnp.linspace(0.05, sch.T * 0.98, 20)
    lam = sch.marginal_lambda(t)
    t_rec = sch.inverse_lambda(lam)
    np.testing.assert_allclose(np.asarray(t_rec), np.asarray(t), atol=2e-3)


def test_discrete_from_betas():
    # the reference's betas branch is dead code due to a NameError
    # (noise_schedule.py:30); verify ours implements it correctly.
    betas = np.linspace(1e-4, 2e-2, 1000)
    sch = NoiseSchedule.create("discrete", betas=betas)
    log_alpha_expected = 0.5 * np.cumsum(np.log(1 - betas))
    np.testing.assert_allclose(
        np.asarray(sch.log_alpha_array), log_alpha_expected, rtol=1e-5
    )
    a, s = sch.marginal_prob(jnp.asarray([1.0]))
    np.testing.assert_allclose(float(a[0]), np.exp(log_alpha_expected[-1]), rtol=1e-4)


def test_interp_extrapolates():
    xp = jnp.asarray([1.0, 2.0, 3.0])
    yp = jnp.asarray([10.0, 20.0, 30.0])
    x = jnp.asarray([0.0, 1.5, 4.0])
    np.testing.assert_allclose(np.asarray(interp_lin(x, xp, yp)), [0.0, 15.0, 40.0], rtol=1e-6)


def test_polynomial_schedule_monotone():
    a2 = polynomial_alphas2(1000)
    assert len(a2) == 1000
    assert np.all(np.diff(a2) <= 0)
    assert a2[0] < 1.0 and a2[-1] > 0.0


def test_log_snr_matches_noise_level():
    sch = NoiseSchedule.create("cosine")
    t = jnp.asarray([0.3, 0.7])
    a, s = sch.marginal_prob(t)
    np.testing.assert_allclose(
        np.asarray(sch.log_snr(t)), np.asarray(jnp.log(a**2 / s**2)), rtol=1e-5
    )
