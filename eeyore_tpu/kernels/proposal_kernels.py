"""Proposal (probability-density) kernels for MCMC samplers.

Reference: /root/reference/eeyore/kernels/{normal_kernel,multivariate_normal_kernel,
demc_kernel}.py. The reference mutates a torch distribution in place
(``set_density_params``); here kernels are stateless — the location is an
explicit argument, so the same kernel object works under jit/vmap/scan.
``log_prob`` sums over components, matching
NormalizedKernel.log_prob = sum(density.log_prob(state))
(normalized_kernel.py:15-16).
"""

import math

import jax
import jax.numpy as jnp


class NormalKernel:
    """iid Normal proposal with fixed scale (possibly per-coordinate)."""

    def __init__(self, scale):
        self.scale = jnp.asarray(scale)

    def sample(self, key, loc):
        return loc + self.scale * jax.random.normal(key, jnp.shape(loc), dtype=jnp.asarray(loc).dtype)

    def log_prob(self, x, loc):
        z = (x - loc) / self.scale
        per = -0.5 * z * z - jnp.log(self.scale) - 0.5 * math.log(2.0 * math.pi)
        return jnp.sum(per)


class MultivariateNormalKernel:
    """MVN proposal via lower-triangular ``scale_tril``."""

    def __init__(self, scale_tril):
        self.scale_tril = jnp.asarray(scale_tril)

    def sample(self, key, loc):
        z = jax.random.normal(key, jnp.shape(loc), dtype=jnp.asarray(loc).dtype)
        return loc + self.scale_tril @ z

    def log_prob(self, x, loc):
        diff = x - loc
        # Solve L z = diff; log N(x; loc, L L^T)
        z = jax.scipy.linalg.solve_triangular(self.scale_tril, diff, lower=True)
        half_log_det = jnp.sum(jnp.log(jnp.diag(self.scale_tril)))
        d = diff.shape[-1]
        return -0.5 * jnp.sum(z * z) - half_log_det - 0.5 * d * math.log(2.0 * math.pi)


class DEMCKernel:
    """Differential-evolution MC proposal: mean = theta + c * (a - b) where a,
    b are two other population states (reference demc_kernel.py:7-38; the
    reference ships this kernel with no sampler — eeyore_tpu.samplers.DEMC
    completes it)."""

    def __init__(self, c=0.1, scale=1e-3):
        self.c = c
        self.scale = jnp.asarray(scale)

    def mean(self, theta, a, b):
        return theta + self.c * (a - b)

    def sample(self, key, theta, a, b):
        loc = self.mean(theta, a, b)
        return loc + self.scale * jax.random.normal(key, jnp.shape(loc), dtype=jnp.asarray(loc).dtype)

    def log_prob(self, x, theta, a, b):
        loc = self.mean(theta, a, b)
        z = (x - loc) / self.scale
        per = -0.5 * z * z - jnp.log(self.scale) - 0.5 * math.log(2.0 * math.pi)
        return jnp.sum(per)
