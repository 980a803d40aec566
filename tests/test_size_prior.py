import numpy as np
import pytest

from diffsbdd_tpu.diffusion.size_prior import SizeDistribution


@pytest.fixture
def dist():
    rng = np.random.default_rng(0)
    hist = rng.integers(0, 50, size=(15, 25)).astype(float)
    return SizeDistribution(hist)


def test_normalization(dist):
    assert abs(dist.prob.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(dist.prob_n1_given_n2.sum(axis=0), 1.0)
    np.testing.assert_allclose(dist.prob_n2_given_n1.sum(axis=1), 1.0)


def test_sampling_shapes_and_ranges(dist):
    rng = np.random.default_rng(1)
    n1, n2 = dist.sample(100, rng=rng)
    assert n1.shape == (100,) and n2.shape == (100,)
    assert n1.max() <= dist.n1_max and n2.max() <= dist.n2_max

    cond = dist.sample_conditional(n2=np.array([3, 5, 7]), rng=rng)
    assert cond.shape == (3,)
    cond2 = dist.sample_conditional(n1=np.array([2, 4]), rng=rng)
    assert cond2.shape == (2,)

    with pytest.raises(ValueError):
        dist.sample_conditional()


def test_log_prob_consistency(dist):
    # device gather agrees with numpy table
    lp = np.asarray(dist.log_prob(np.array([1, 2]), np.array([3, 4])))
    np.testing.assert_allclose(
        lp, dist.log_prob_table[[1, 2], [3, 4]], rtol=1e-6)
    lp_c = np.asarray(dist.log_prob_n1_given_n2(np.array([1]), np.array([3])))
    np.testing.assert_allclose(
        lp_c, dist.log_prob_n1_given_n2_table[[1], [3]], rtol=1e-6)
    # conditional = joint - marginal
    joint = dist.log_prob_table[5, 7]
    marg = np.log(dist.prob.sum(axis=0))[7]
    np.testing.assert_allclose(
        dist.log_prob_n1_given_n2_table[5, 7], joint - marg, rtol=1e-10)


def test_conditional_sampling_statistics():
    hist = np.zeros((4, 3))
    hist[1, 0] = 100.0  # p(n1=1 | n2=0) ~ 1
    hist[3, 2] = 100.0
    dist = SizeDistribution(hist)
    rng = np.random.default_rng(2)
    s = dist.sample_conditional(n2=np.zeros(50, dtype=int), rng=rng)
    assert (s == 1).mean() > 0.95
