"""Multivariate potential scale reduction factor.

Brooks-Gelman lemma-2 PSRF over an [m, n, p] stack of chains: within-chain
dispersion W = mean of the per-chain Monte-Carlo covariances, between-chain
dispersion B = covariance of the chain means, and

    Rhat = (n - 1)/n + (m + 1)/m * lambda_max(W^{-1} B).

Semantics (including the nearest-PD projection fallback and the returned
6-tuple) follow /root/reference/eeyore/stats/multi_rhat.py:10-40; the top
eigenvalue here comes from ``solve(W, B)`` rather than an explicit inverse.
"""

import numpy as np

from eeyore_tpu.linalg import is_pos_def, nearest_pd
from eeyore_tpu.stats.cov import cov
from eeyore_tpu.stats.mc_cov import mc_cov


def _pd_or_project(mat):
    """Return (mat, True) when PD, else (nearest-PD projection, False)."""
    if is_pos_def(mat):
        return mat, True
    return nearest_pd(mat), False


def multi_rhat(x, mc_cov_mat=None, method="inse", adjust=False):
    draws = np.asarray(x, dtype=np.float64)
    m, n, _ = draws.shape

    if mc_cov_mat is None:
        per_chain = [mc_cov(draws[c], method=method, adjust=adjust, rowvar=False)
                     for c in range(m)]
    else:
        per_chain = [np.asarray(s, dtype=np.float64) for s in mc_cov_mat]
    w, w_was_pd = _pd_or_project(np.mean(per_chain, axis=0))
    b, b_was_pd = _pd_or_project(cov(draws.mean(axis=1), rowvar=False))

    lam = np.linalg.eigvals(np.linalg.solve(w, np.atleast_2d(b)))
    top = int(np.argmax(lam.real))
    psrf = (n - 1.0) / n + (m + 1.0) / m * lam.real[top]

    return psrf, float(lam.imag[top]), w, b, w_was_pd, b_was_pd
