"""Proposal-kernel tests: Normal / MVN log-probs against scipy-style closed
forms, DEMC proposal mean, MVN-proposal MH end-to-end."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.kernels import DEMCKernel, MultivariateNormalKernel, NormalKernel

RNG = np.random.default_rng(5)


def normal_logpdf(x, loc, scale):
    return np.sum(-0.5 * ((x - loc) / scale) ** 2 - np.log(scale) - 0.5 * np.log(2 * np.pi))


class TestNormalKernel:
    def test_log_prob(self):
        k = NormalKernel(jnp.asarray([1.0, 2.0]))
        x = RNG.normal(size=2)
        loc = RNG.normal(size=2)
        np.testing.assert_allclose(
            float(k.log_prob(jnp.asarray(x), jnp.asarray(loc))),
            normal_logpdf(x, loc, np.array([1.0, 2.0])), rtol=1e-12)

    def test_sample_moments(self):
        k = NormalKernel(0.5)
        keys = jax.random.split(jax.random.PRNGKey(0), 2000)
        samples = np.stack([np.asarray(k.sample(kk, jnp.asarray([3.0]))) for kk in keys])
        assert abs(samples.mean() - 3.0) < 0.05
        assert abs(samples.std() - 0.5) < 0.05


class TestMVNKernel:
    def test_log_prob_vs_closed_form(self):
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        tril = np.linalg.cholesky(cov)
        k = MultivariateNormalKernel(jnp.asarray(tril))
        x = RNG.normal(size=2)
        loc = RNG.normal(size=2)
        diff = x - loc
        expected = (-0.5 * diff @ np.linalg.inv(cov) @ diff
                    - 0.5 * np.log(np.linalg.det(cov)) - math.log(2 * math.pi))
        np.testing.assert_allclose(
            float(k.log_prob(jnp.asarray(x), jnp.asarray(loc))), expected, rtol=1e-10)

    def test_mh_with_mvn_proposal(self):
        from eeyore_tpu.models import DistributionModel
        from eeyore_tpu.samplers import MetropolisHastings, sample_chain

        cov = np.array([[1.0, 0.5], [0.5, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov))
        model = DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)
        proposal = MultivariateNormalKernel(jnp.asarray(np.linalg.cholesky(0.5 * cov)))
        kern = MetropolisHastings(model, kernel=proposal)
        chain = sample_chain(kern, jax.random.PRNGKey(0), jnp.asarray([2.0, 2.0]),
                             (jnp.zeros((1, 0)), jnp.zeros((1, 0))), 8000, 1000)
        s = chain.get_samples()
        np.testing.assert_allclose(s.mean(0), np.zeros(2), atol=0.15)
        np.testing.assert_allclose(np.cov(s, rowvar=False), cov, atol=0.25)


class TestDEMCKernel:
    def test_mean_and_log_prob(self):
        k = DEMCKernel(c=0.2, scale=0.1)
        theta = jnp.asarray([1.0, 1.0])
        a = jnp.asarray([2.0, 0.0])
        b = jnp.asarray([0.0, 1.0])
        np.testing.assert_allclose(np.asarray(k.mean(theta, a, b)), [1.4, 0.8], rtol=1e-12)
        x = jnp.asarray([1.5, 0.7])
        expected = normal_logpdf(np.asarray(x), np.array([1.4, 0.8]), np.array([0.1, 0.1]))
        np.testing.assert_allclose(float(k.log_prob(x, theta, a, b)), expected, rtol=1e-10)
