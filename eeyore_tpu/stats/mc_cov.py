"""Monte-Carlo covariance estimators for correlated MCMC samples.

``inse_mc_cov`` is the initial-sequence (INSE) multivariate estimator of
Dai & Jones 2017 (reference: /root/reference/eeyore/stats/inse_mc_cov.py:9-83,
following the notation of the R package mcmcse's insec.cpp). The reference
computes each lag-pair autocovariance with O(n p^2) Python loops of outer
products; here each lag autocovariance is ONE matmul of the centered chain
against a shifted copy of itself — O(n p^2) FLOPs on BLAS instead of Python.

Contract (identical to reference):
- Gamma_m = (gamma_{2m} + gamma_{2m+1}) symmetrized; Sigma grows by 2*Gamma_m
  until it first becomes positive definite, then until det stops increasing.
- ``adjust=True`` subtracts the positive-eigenvalue parts of the remaining
  Gammas (eigenvalue clipping), added as 2*Gamadj at the end.
- Raises RuntimeError('Not enough samples') if no PD point is found in
  m < floor(n/2).
"""

import numpy as np

from eeyore_tpu.linalg import is_pos_def
from eeyore_tpu.stats.cov import cov


def _lag_autocov(x_ctr, lag):
    """gamma_lag = (1/n) sum_i x_ctr[i] outer x_ctr[i+lag]; one matmul."""
    n = x_ctr.shape[0]
    if lag >= n:
        return np.zeros((x_ctr.shape[1], x_ctr.shape[1]))
    return (x_ctr[: n - lag].T @ x_ctr[lag:]) / n


def inse_mc_cov(x, adjust=False):
    x = np.asarray(x, dtype=np.float64)
    x_ctr = x - x.mean(axis=0)
    n, p = x.shape

    ub = n // 2
    sn = ub

    gamadj = np.zeros((p, p)) if adjust else None

    sig = None
    for m in range(ub):
        gam0 = _lag_autocov(x_ctr, 2 * m)
        gam1 = _lag_autocov(x_ctr, 2 * m + 1)
        gam = gam0 + gam1
        gam = (gam + gam.T) / 2

        if m == 0:
            sig = -gam0 + 2 * gam
        else:
            sig = sig + 2 * gam

        if is_pos_def(sig):
            sn = m
            break

    if sn > ub - 1:
        raise RuntimeError("Not enough samples")

    last_det = np.linalg.det(sig)

    for m in range(sn + 1, ub):
        gam0 = _lag_autocov(x_ctr, 2 * m)
        gam1 = _lag_autocov(x_ctr, 2 * m + 1)
        gam = gam0 + gam1
        gam = (gam + gam.T) / 2

        sig1 = sig + 2 * gam
        current_det = np.linalg.det(sig1)
        if current_det <= last_det:
            break
        sig = sig1
        last_det = current_det

        if adjust:
            eigenvals, eigenvecs = np.linalg.eigh(gam)
            eigenvals = np.where(eigenvals > 0, 0.0, eigenvals)
            gamadj = gamadj - eigenvecs @ np.diag(eigenvals) @ eigenvecs.T

    if adjust:
        sig = sig + 2 * gamadj

    return sig


def mc_cov(x, method="inse", adjust=False, rowvar=False):
    if method == "inse":
        return inse_mc_cov(x, adjust=adjust)
    elif method == "iid":
        return cov(x, rowvar=rowvar)
    raise ValueError(f"The method can be inse or iid, {method} was given")


def mc_se_from_cov(mc_cov_mat):
    """sqrt(diag(mc_cov)) (reference: mc_se_from_cov.py:3-4 — note: NOT
    divided by n; the reference reports the sqrt asymptotic variance)."""
    return np.sqrt(np.diag(np.asarray(mc_cov_mat, dtype=np.float64)))


def mc_se(x, method="inse", adjust=False, rowvar=False):
    return mc_se_from_cov(mc_cov(x, method=method, adjust=adjust, rowvar=rowvar))


def mc_cor(x, method="inse", adjust=False, rowvar=False):
    from eeyore_tpu.stats.cov import cor_from_cov

    return cor_from_cov(mc_cov(x, method=method, adjust=adjust, rowvar=rowvar))
