"""Multivariate effective sample size (Vats-Flegal-Jones).

multi_ess = n * (det(cov) / det(mc_cov))^(1/p)
(reference: /root/reference/eeyore/stats/multi_ess.py:6-14).
"""

import numpy as np

from eeyore_tpu.stats.cov import cov
from eeyore_tpu.stats.mc_cov import mc_cov


def multi_ess(x, mc_cov_mat=None, method="inse", adjust=False):
    x = np.asarray(x, dtype=np.float64)
    num_iters, num_pars = x.shape

    cov_det = np.linalg.det(cov(x, rowvar=False))
    if mc_cov_mat is None:
        mc_cov_mat = mc_cov(x, method=method, adjust=adjust, rowvar=False)
    mc_cov_det = np.linalg.det(np.asarray(mc_cov_mat, dtype=np.float64))

    return num_iters * (cov_det / mc_cov_det) ** (1.0 / num_pars)
