"""Sample covariance / correlation (host-side numpy, float64).

Reference semantics: /root/reference/eeyore/stats/cov.py:5-15 (unbiased, n-1
denominator), cor.py, cor_from_cov.py.
"""

import numpy as np


def cov(x, rowvar=False):
    """Unbiased sample covariance. x: [n, p] when rowvar=False."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim > 2:
        raise ValueError("x has more than 2 dimensions")
    if x.ndim < 2:
        x = x.reshape(1, -1)
    if not rowvar and x.shape[0] != 1:
        x = x.T
    x_ctr = x - x.mean(axis=1, keepdims=True)
    return np.squeeze(x_ctr @ x_ctr.T) / (x.shape[1] - 1)


def cor_from_cov(cov_mat):
    cov_mat = np.asarray(cov_mat, dtype=np.float64)
    inv_sd = 1.0 / np.sqrt(np.diag(cov_mat))
    return cov_mat * np.outer(inv_sd, inv_sd)


def cor(x, rowvar=False):
    return cor_from_cov(cov(x, rowvar=rowvar))
