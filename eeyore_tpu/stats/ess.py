"""Multivariate effective sample size, evaluated in log-determinant space.

Semantics follow Vats-Flegal-Jones: ESS = n * (|S| / |M|)^(1/p) where S is the
sample covariance and M the Monte-Carlo (long-run) covariance of the chain
(reference: /root/reference/eeyore/stats/multi_ess.py:6-14). Unlike the
reference, the determinant ratio is computed via ``slogdet`` so the estimate
stays finite when p is large enough for the raw determinants to under/overflow
float64.
"""

import numpy as np

from eeyore_tpu.stats.cov import cov
from eeyore_tpu.stats.mc_cov import mc_cov


def multi_ess(x, mc_cov_mat=None, method="inse", adjust=False):
    draws = np.asarray(x, dtype=np.float64)
    n, p = draws.shape

    if mc_cov_mat is None:
        mc_cov_mat = mc_cov(draws, method=method, adjust=adjust, rowvar=False)

    s_sign, s_logdet = np.linalg.slogdet(cov(draws, rowvar=False))
    m_sign, m_logdet = np.linalg.slogdet(np.asarray(mc_cov_mat, dtype=np.float64))

    if s_sign <= 0 or m_sign <= 0:
        # A non-PD covariance estimate: reproduce the reference's raw-ratio
        # arithmetic (which yields nan for a negative ratio at fractional power).
        ratio = (s_sign * np.exp(s_logdet)) / (m_sign * np.exp(m_logdet))
        return float(n * np.power(ratio, 1.0 / p))
    return float(n * np.exp((s_logdet - m_logdet) / p))
