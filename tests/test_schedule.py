import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsbdd_tpu.diffusion import schedule as S


pytestmark = pytest.mark.quick

def test_polynomial_schedule_closed_form_head():
    """For the polynomial_2 schedule, before clipping kicks in the table obeys
    alpha2(t) = (1-2s) * clip((1-(t/(T+1))^2)^2) + s exactly."""
    T, s = 500, 5e-4
    a2 = S.polynomial_alphas2(T, s=s, power=2.0)
    steps = T + 1
    x = np.linspace(0, steps, steps)
    raw = (1 - (x / steps) ** 2) ** 2
    expected = (1 - 2 * s) * S.clip_noise_schedule(raw) + s
    np.testing.assert_allclose(a2, expected, rtol=1e-12)
    assert a2.shape == (T + 1,)
    assert np.all(np.diff(a2) < 0)  # strictly decreasing
    assert a2[0] <= 1.0 and a2[-1] >= s


def test_gamma_table_monotone_and_consistent():
    T = 500
    g = S.gamma_table("polynomial_2", T, 5e-4)
    assert g.shape == (T + 1,)
    assert np.all(np.diff(g) > 0)  # gamma increases with t
    # alpha^2 + sigma^2 == 1 by construction of the sigmoid map
    a = S.alpha(jnp.asarray(g))
    s = S.sigma(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, atol=1e-5)
    # and they reproduce the generating alphas2 table
    a2 = S.polynomial_alphas2(T, s=5e-4, power=2.0)
    np.testing.assert_allclose(np.asarray(a) ** 2, a2, rtol=2e-4)


def test_cosine_schedule():
    g = S.gamma_table("cosine", 100, 5e-4)
    assert g.shape == (101,)
    assert np.all(np.diff(g) > 0)


def test_noise_schedule_lookup():
    T = 500
    ns = S.NoiseSchedule.create("polynomial_2", T, 5e-4)
    t = jnp.array([[0.0], [0.5], [1.0]])
    g = ns(t)
    assert g.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(g[0, 0]), np.asarray(ns.gammas[0]))
    np.testing.assert_allclose(np.asarray(g[2, 0]), np.asarray(ns.gammas[T]))


def test_sigma_alpha_t_given_s_identities():
    """alpha_{t|s} = alpha_t/alpha_s and sigma^2_{t|s} = sigma_t^2 - alpha_{t|s}^2 sigma_s^2."""
    ns = S.NoiseSchedule.create("polynomial_2", 500, 5e-4)
    gs = ns(jnp.array(0.3))
    gt = ns(jnp.array(0.7))
    s2_tgs, s_tgs, a_tgs = S.sigma_and_alpha_t_given_s(gt, gs)
    a_t, a_s = S.alpha(gt), S.alpha(gs)
    s_t, s_s = S.sigma(gt), S.sigma(gs)
    np.testing.assert_allclose(float(a_tgs), float(a_t / a_s), rtol=1e-4)
    np.testing.assert_allclose(
        float(s2_tgs), float(s_t**2 - (a_tgs**2) * s_s**2), atol=1e-4)
    np.testing.assert_allclose(float(s_tgs), float(jnp.sqrt(s2_tgs)), rtol=1e-5)


def test_snr():
    g = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(S.snr(g)), np.exp(-np.array([-2.0, 0.0, 3.0])), rtol=1e-5)


def test_gamma_network_monotone():
    net = S.GammaNetwork()
    t = jnp.linspace(0, 1, 64)[:, None]
    params = net.init(jax.random.PRNGKey(0), t)
    g = net.apply(params, t)
    assert g.shape == (64, 1)
    diffs = np.diff(np.asarray(g[:, 0]))
    assert np.all(diffs >= -1e-6)  # monotone non-decreasing
    # endpoints pinned to (gamma_0, gamma_1)
    np.testing.assert_allclose(float(g[0, 0]), -5.0, atol=1e-4)
    np.testing.assert_allclose(float(g[-1, 0]), 10.0, atol=1e-4)


def test_cdf_standard_gaussian():
    np.testing.assert_allclose(float(S.cdf_standard_gaussian(jnp.array(0.0))), 0.5)
    np.testing.assert_allclose(
        float(S.cdf_standard_gaussian(jnp.array(1.96))), 0.975, atol=1e-3)
