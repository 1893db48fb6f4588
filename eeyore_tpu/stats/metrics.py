"""SoftAbs metric: eigenvalue-softened PD-ification of a symmetric matrix.

softabs(H, a) = Q diag(lambda / tanh(a * lambda)) Q^T
(reference: /root/reference/eeyore/stats/metrics.py:3-5; used e.g. as the AM
covariance ``transform`` for PD safety).
"""

import jax.numpy as jnp


def softabs(hessian, a=1000.0):
    l, q = jnp.linalg.eigh(hessian)
    softened = l / jnp.tanh(a * l)
    return (q * softened) @ q.T
