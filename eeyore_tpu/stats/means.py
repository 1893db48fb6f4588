"""Streaming moment updates (AM adaptation, chain running means).

Reference: /root/reference/eeyore/stats/recursive_mean.py, recursive_cov.py,
running_mean.py. These run inside jitted samplers, so they are jnp-based.
"""

import jax.numpy as jnp


def recursive_mean(last_mean, n, x, offset=0):
    """Streaming mean update: mean_k = ((k-1) mean_{k-1} + x) / k with
    k = n - offset."""
    k = n - offset
    return ((k - 1) * last_mean + x) / k


def recursive_cov(last_cov, last_mean, second_last_mean, n, x, offset=0):
    """Streaming covariance update (reference recursive_cov.py:3-11, minus its
    leftover debug print): with k = n - offset,
    cov_k = ((k-1) cov_{k-1} + x x' - (k+1) m_k m_k' + k m_{k-1} m_{k-1}') / k."""
    k = n - offset
    return (
        (k - 1) * last_cov
        + jnp.outer(x, x)
        - (k + 1) * jnp.outer(last_mean, last_mean)
        + k * jnp.outer(second_last_mean, second_last_mean)
    ) / k


def running_mean(x, axis=0):
    """Cumulative running mean along an axis."""
    x = jnp.asarray(x)
    counts = jnp.arange(1, x.shape[axis] + 1, dtype=x.dtype)
    shape = [1] * x.ndim
    shape[axis] = -1
    return jnp.cumsum(x, axis=axis) / counts.reshape(shape)
