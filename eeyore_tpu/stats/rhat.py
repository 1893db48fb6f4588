"""Multivariate potential scale reduction factor (Brooks-Gelman lemma 2).

Reference: /root/reference/eeyore/stats/multi_rhat.py:10-40. Within-chain W is
the mean per-chain mc_cov; between-chain B is the covariance of chain means;
Rhat = (n-1)/n + (m+1)/m * lambda_max(W^{-1} B), with nearest-PD fallbacks.
Returns (rhat, imag_part_of_top_eigval, w, b, is_w_pd, is_b_pd).
"""

import numpy as np

from eeyore_tpu.linalg import is_pos_def, nearest_pd
from eeyore_tpu.stats.cov import cov
from eeyore_tpu.stats.mc_cov import mc_cov


def multi_rhat(x, mc_cov_mat=None, method="inse", adjust=False):
    x = np.asarray(x, dtype=np.float64)
    num_chains, num_iters, num_pars = x.shape

    w = np.zeros((num_pars, num_pars))
    for i in range(num_chains):
        if mc_cov_mat is None:
            w = w + mc_cov(x[i], method=method, adjust=adjust, rowvar=False)
        else:
            w = w + np.asarray(mc_cov_mat[i], dtype=np.float64)
    w = w / num_chains

    if not is_pos_def(w):
        w = nearest_pd(w)
        is_w_pd = False
    else:
        is_w_pd = True

    b = cov(x.mean(axis=1), rowvar=False)

    if not is_pos_def(b):
        b = nearest_pd(b)
        is_b_pd = False
    else:
        is_b_pd = True

    eigvals = np.linalg.eigvals(np.linalg.inv(w) @ np.atleast_2d(b))
    top = np.argmax(eigvals.real)
    rhat = (num_iters - 1) / num_iters + ((num_chains + 1) / num_chains) * eigvals.real[top]

    return rhat, float(eigvals.imag[top]), w, b, is_w_pd, is_b_pd
