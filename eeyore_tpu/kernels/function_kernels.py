"""Distance-based function kernels (used by the MMD discrepancy).

Reference: /root/reference/eeyore/kernels/{homogeneous_kernel,iso_se_kernel,
periodic_kernel,rq_kernel}.py. The reference evaluates k(x1, x2) pointwise in
O(n^2) Python loops; here ``gram`` computes the full Gram matrix from one
batched pairwise-distance computation.
"""

import jax.numpy as jnp


class HomogeneousKernel:
    """Base for kernels k(x1, x2) = f(||x1 - x2||)."""

    def k(self, x1, x2):
        """Scalar kernel value between two points."""
        return self._from_sqdist(jnp.sum((jnp.asarray(x1) - jnp.asarray(x2)) ** 2))

    def _from_sqdist(self, sqdist):
        raise NotImplementedError

    def gram(self, x1, x2):
        """Pairwise Gram matrix [n1, n2] via ||a-b||^2 = |a|^2 + |b|^2 - 2ab."""
        x1 = jnp.atleast_2d(jnp.asarray(x1))
        x2 = jnp.atleast_2d(jnp.asarray(x2))
        sq1 = jnp.sum(x1 * x1, axis=1, keepdims=True)
        sq2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
        sqdist = jnp.maximum(sq1 + sq2.T - 2.0 * (x1 @ x2.T), 0.0)
        return self._from_sqdist(sqdist)

    # Reference-API-compatible Gram sums (kernel.py:26-101), vectorized.
    def symm_K(self, x):
        return self.gram(x, x)

    def K(self, x1, x2):
        return self.gram(x1, x2)

    def sum_symm_K(self, x, include_diag=True):
        g = self.gram(x, x)
        total = jnp.sum(g)
        return total if include_diag else total - jnp.trace(g)

    def sum_K(self, x1, x2):
        return jnp.sum(self.gram(x1, x2))


class IsoSEKernel(HomogeneousKernel):
    """Isotropic squared exponential: scale * exp(-d^2 / (2 l))."""

    def __init__(self, scale=1.0, l=1.0):
        self.scale = scale  # squared amplitude
        self.l = l  # squared lengthscale

    def _from_sqdist(self, sqdist):
        return self.scale * jnp.exp(-sqdist / (2.0 * self.l))


class PeriodicKernel(HomogeneousKernel):
    """scale * exp(-2 sin^2(d / p) / l)."""

    def __init__(self, scale=1.0, l=1.0, p=2.0):
        self.scale = scale
        self.l = l
        self.p = p

    def _from_sqdist(self, sqdist):
        d = jnp.sqrt(sqdist)
        return self.scale * jnp.exp(-2.0 * jnp.sin(d / self.p) ** 2 / self.l)


class RQKernel(HomogeneousKernel):
    """Rational quadratic: scale * (1 + d^2 / (2 a l))^(-a)."""

    def __init__(self, scale=1.0, l=1.0, a=1.0):
        self.scale = scale
        self.l = l
        self.a = a

    def _from_sqdist(self, sqdist):
        return self.scale * (1.0 + sqdist / (2.0 * self.a * self.l)) ** (-self.a)
