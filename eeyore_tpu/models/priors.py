"""Priors over the flat parameter vector.

The reference default prior is iid standard Normal over all parameters
(/root/reference/eeyore/models/mlp.py:31-35); any torch distribution with
``log_prob``/``sample`` is pluggable. Here a prior is any object with
``log_prob(theta) -> per-component log-densities`` and ``sample(key)``.
"""

import math

import jax
import jax.numpy as jnp


class IIDNormalPrior:
    """Independent Normal prior, one (loc, scale) pair per parameter.

    ``log_prob`` returns per-component log densities (like
    ``torch.distributions.Normal.log_prob``); the model sums them, matching
    ``log_prior = sum(prior.log_prob(get_params()))``
    (/root/reference/eeyore/models/bayesian_model.py:46-50).
    """

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @classmethod
    def standard(cls, num_params, dtype=None):
        dtype = dtype or jnp.zeros((), dtype=float).dtype
        return cls(jnp.zeros(num_params, dtype=dtype), jnp.ones(num_params, dtype=dtype))

    @classmethod
    def isotropic(cls, num_params, scale, dtype=None):
        dtype = dtype or jnp.zeros((), dtype=float).dtype
        return cls(jnp.zeros(num_params, dtype=dtype), jnp.full((num_params,), scale, dtype=dtype))

    @property
    def dtype(self):
        return self.loc.dtype

    def log_prob(self, theta):
        z = (theta - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * math.log(2.0 * math.pi)

    def sample(self, key):
        return self.loc + self.scale * jax.random.normal(key, self.loc.shape, dtype=self.loc.dtype)
