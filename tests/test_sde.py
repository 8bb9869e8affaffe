"""Unit tests for the SDE primitives against closed-form values.

Oracle values mirror the reference formulas (diffusion.py:818-1366) computed
independently in float64 NumPy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowfusion_tpu.ops.sde import SUBVPSDE, VESDE, VPSDE


def test_vesde_sigma_closed_form():
    sde = VESDE(sigma_min=1e-2, sigma_max=10.0, T=1.0)
    t = np.linspace(0.0, 1.0, 7)
    expected = 1e-2 * (10.0 / 1e-2) ** t
    np.testing.assert_allclose(sde.sigma(jnp.asarray(t)), expected, rtol=1e-5)


def test_vesde_diffusion_matches_dsigma2_dt():
    # For VESDE, g(t)^2 = d sigma^2(t) / dt.
    sde = VESDE()
    t = np.array([0.2, 0.5, 0.9])
    x = jnp.ones((3, 2))
    g = np.asarray(sde.diffusion(jnp.asarray(t), x))[:, 0]
    eps = 1e-4
    s2 = lambda tt: (1e-2 * (10.0 / 1e-2) ** tt) ** 2
    dsigma2 = (s2(t + eps) - s2(t - eps)) / (2 * eps)
    np.testing.assert_allclose(g**2, dsigma2, rtol=1e-3)


def test_vesde_defaults_and_prior():
    sde = VESDE()
    assert sde.epsilon == 1e-5 and sde.T == 1.0
    assert sde.prior_scale == 10.0
    x = jnp.asarray([[0.0, 1.0]])
    lp = np.asarray(sde.prior_log_prob(x))
    expected = -0.5 * (np.array([0.0, 1.0]) / 10) ** 2 - np.log(10) - 0.5 * np.log(
        2 * np.pi
    )
    np.testing.assert_allclose(lp[0], expected, rtol=1e-6)


@pytest.mark.parametrize("cls", [VPSDE, SUBVPSDE])
def test_vp_family_defaults(cls):
    sde = cls()
    assert sde.beta_min == 0.1 and sde.beta_max == 20.0
    assert sde.T == 1.0 and sde.epsilon == 1e-3
    assert sde.prior_scale == 1.0


def test_vpsde_marginal_scalars_song_eq33():
    sde = VPSDE()
    t = np.linspace(0.01, 1.0, 9)
    B = 0.5 * (20.0 - 0.1) * t**2 + 0.1 * t
    nu, eta = sde.marginal_prob_scalars(jnp.asarray(t))
    np.testing.assert_allclose(nu, np.exp(-0.5 * B), rtol=1e-5)
    np.testing.assert_allclose(eta, np.sqrt(1 - np.exp(-B)), rtol=1e-5, atol=2e-6)


def test_subvpsde_marginal_std_no_sqrt():
    sde = SUBVPSDE()
    t = np.linspace(0.01, 1.0, 9)
    B = 0.5 * (20.0 - 0.1) * t**2 + 0.1 * t
    _, eta = sde.marginal_prob_scalars(jnp.asarray(t))
    np.testing.assert_allclose(eta, 1 - np.exp(-B), rtol=1e-5)


def test_subvpsde_diffusion_formula():
    sde = SUBVPSDE()
    t = np.array([0.3, 0.7])
    x = jnp.ones((2, 3))
    beta = 0.1 + (20.0 - 0.1) * t
    disc = 1 - np.exp(-2 * 0.1 * t - (20.0 - 0.1) * t**2)
    g = np.asarray(sde.diffusion(jnp.asarray(t), x))[:, 0]
    np.testing.assert_allclose(g, np.sqrt(beta * disc), rtol=1e-5)


def test_vpsde_drift_shape_and_value():
    sde = VPSDE()
    t = jnp.asarray([0.5])
    x = jnp.asarray([[2.0, -4.0]])
    beta = 0.1 + (20.0 - 0.1) * 0.5
    np.testing.assert_allclose(
        sde.drift(t, x), -0.5 * beta * np.array([[2.0, -4.0]]), rtol=1e-5
    )


def test_marginal_prob_broadcasting():
    sde = VPSDE()
    t = jnp.linspace(0.1, 0.9, 4)
    x = jnp.ones((4, 3))
    mean, std = sde.marginal_prob(t, x)
    assert mean.shape == (4, 3) and std.shape == (4, 3)
    nu, eta = sde.marginal_prob_scalars(t)
    np.testing.assert_allclose(mean[:, 0], nu, rtol=1e-6)
    np.testing.assert_allclose(std[:, 0], eta, rtol=1e-6)


def test_sample_marginal_statistics():
    sde = VPSDE()
    key = jax.random.PRNGKey(0)
    x0 = jnp.full((20000, 2), 3.0)
    t = jnp.full((20000,), 0.5)
    xt = sde.sample_marginal(key, t, x0)
    nu, eta = sde.marginal_prob_scalars(jnp.asarray(0.5))
    np.testing.assert_allclose(np.mean(np.asarray(xt)), 3.0 * nu, atol=0.02)
    np.testing.assert_allclose(np.std(np.asarray(xt)), eta, atol=0.02)


def test_sdes_are_hashable_static_args():
    # SDEs must be usable as static args under jit.
    sde = VESDE()
    hash(sde)

    @jax.jit
    def f(x):
        return sde.drift(jnp.asarray([0.5]), x)

    f(jnp.ones((1, 2)))


def test_t_of_log_snr_stable_edge_cases():
    """Stable inverse log-SNR forms (regression: catastrophic cancellation
    gave inf/NaN): sub-VP at large beta_max, VP with a constant-beta
    schedule, and round-trips stay tight."""
    from flowfusion_tpu.ops.sde import SUBVPSDE, VPSDE

    # sub-VP, beta_max=36: old form hit 1+4r^2 == 1 in f32 -> u=0 -> inf
    sde = SUBVPSDE(beta_max=36.0)
    t_back = sde.t_of_log_snr(sde.log_snr(jnp.asarray(1.0)))
    assert np.isfinite(float(t_back))
    np.testing.assert_allclose(float(t_back), 1.0, rtol=1e-3)

    # constant-beta VP: old quadratic root was 0/0 = NaN
    sde_c = VPSDE(beta_min=0.1, beta_max=0.1)
    t_back = sde_c.t_of_log_snr(sde_c.log_snr(jnp.asarray(0.7)))
    np.testing.assert_allclose(float(t_back), 0.7, rtol=1e-4)

    # round-trip accuracy across the schedule for defaults
    for cls in (VPSDE, SUBVPSDE):
        s = cls()
        ts = jnp.linspace(0.05, 1.0, 20)
        back = s.t_of_log_snr(s.log_snr(ts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(ts), rtol=5e-3, atol=2e-4)
