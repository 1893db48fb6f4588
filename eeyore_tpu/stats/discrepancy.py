"""Kernel maximum-mean-discrepancy between two sample sets.

Reference: /root/reference/eeyore/stats/discrepancy.py:3-19, which computes
Gram sums with O(n^2) Python double loops (kernel.py:26-101); here the Gram
matrices come from one batched pairwise-distance computation.

Used to validate samplers against exact samplers (reference example
examples/samplers/distributions/bivariate_normal/metropolis_hastings.py:123-133).
"""

import jax.numpy as jnp


def squared_mmd(x1, x2, kernel, biased=True):
    x1 = jnp.atleast_2d(jnp.asarray(x1))
    x2 = jnp.atleast_2d(jnp.asarray(x2))
    n1, n2 = x1.shape[0], x2.shape[0]

    k11 = kernel.gram(x1, x1)
    k22 = kernel.gram(x2, x2)
    k12 = kernel.gram(x1, x2)

    if biased:
        return (
            jnp.sum(k11) / (n1**2)
            + jnp.sum(k22) / (n2**2)
            - 2 * jnp.sum(k12) / (n1 * n2)
        )
    else:
        return (
            (jnp.sum(k11) - jnp.trace(k11)) / (n1 * (n1 - 1))
            + (jnp.sum(k22) - jnp.trace(k22)) / (n2 * (n2 - 1))
            - 2 * jnp.sum(k12) / (n1 * n2)
        )


def mmd(x1, x2, kernel):
    return jnp.sqrt(squared_mmd(x1, x2, kernel, biased=True))
