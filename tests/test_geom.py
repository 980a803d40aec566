import jax
import pytest
import jax.numpy as jnp
import numpy as np

from diffsbdd_tpu.geom import com
from diffsbdd_tpu.ops.masked import masked_mean, masked_sum, sum_except_batch


pytestmark = pytest.mark.quick

def _rand_batch(key, B=3, NL=7, NP=11):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x_l = jax.random.normal(k1, (B, NL, 3))
    x_p = jax.random.normal(k2, (B, NP, 3))
    m_l = (jax.random.uniform(k3, (B, NL)) > 0.3).astype(jnp.float32)
    m_p = (jax.random.uniform(k4, (B, NP)) > 0.3).astype(jnp.float32)
    # guarantee at least one valid node each
    m_l = m_l.at[:, 0].set(1.0)
    m_p = m_p.at[:, 0].set(1.0)
    return x_l, x_p, m_l, m_p


def test_masked_ops():
    x = jnp.arange(12.0).reshape(1, 4, 3)
    m = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(masked_sum(x, m)), np.asarray(x[:, :2].sum(1)))
    np.testing.assert_allclose(
        np.asarray(masked_mean(x, m)), np.asarray(x[:, :2].mean(1)))
    np.testing.assert_allclose(
        float(sum_except_batch(x, m)[0]), float(x[:, :2].sum()))


def test_remove_mean_joint():
    x_l, x_p, m_l, m_p = _rand_batch(jax.random.PRNGKey(0))
    y_l, y_p = com.remove_mean_joint(x_l, x_p, m_l, m_p)
    combined_sum = masked_sum(y_l, m_l) + masked_sum(y_p, m_p)
    np.testing.assert_allclose(np.asarray(combined_sum), 0.0, atol=1e-5)
    # relative geometry preserved (pure translation)
    np.testing.assert_allclose(
        np.asarray(y_l[:, 1] - y_l[:, 0]), np.asarray(x_l[:, 1] - x_l[:, 0]),
        atol=1e-6)


def test_remove_mean_conditional():
    x_l, x_p, m_l, m_p = _rand_batch(jax.random.PRNGKey(1))
    y_l, y_p = com.remove_mean_conditional(x_l, x_p, m_l, m_p)
    # ligand CoM is zero afterwards
    np.testing.assert_allclose(np.asarray(masked_mean(y_l, m_l)), 0.0, atol=1e-6)
    # pocket is shifted by exactly the ligand CoM (same translation)
    shift = masked_mean(x_l, m_l)
    np.testing.assert_allclose(
        np.asarray(y_p), np.asarray(x_p - shift[:, None, :]), atol=1e-6)


def test_remove_mean_simple_is_identity():
    x_l, x_p, m_l, m_p = _rand_batch(jax.random.PRNGKey(2))
    y_l, y_p = com.remove_mean_simple(x_l, x_p, m_l, m_p)
    assert y_l is x_l and y_p is x_p


def test_drift_and_relative_error():
    x_l, x_p, m_l, m_p = _rand_batch(jax.random.PRNGKey(3))
    y_l, y_p = com.remove_mean_joint(x_l, x_p, m_l, m_p)
    assert float(com.max_com_drift(y_l, y_p, m_l, m_p)) < 1e-4
    x = jnp.concatenate([y_l, y_p], axis=1)
    m = jnp.concatenate([m_l, m_p], axis=1)
    assert float(com.mean_zero_relative_error(x, m)) < 1e-2
