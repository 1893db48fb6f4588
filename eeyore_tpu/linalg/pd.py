"""Positive-definiteness guards (host-side numpy — these back the post-hoc
diagnostics, not the jitted sampling path).

Reference semantics: /root/reference/eeyore/linalg/is_pos_def.py:3-11 (symmetric
+ Cholesky succeeds) and nearest_pd.py:9-42 (Higham-style projection with an
eigenvalue jitter loop).
"""

import numpy as np


def is_pos_def(a):
    a = np.asarray(a)
    if not np.array_equal(a, a.T):
        return False
    try:
        np.linalg.cholesky(a)
        return True
    except np.linalg.LinAlgError:
        return False


def nearest_pd(a, f=np.spacing):
    """Nearest positive-definite matrix (Higham 1988): symmetrize, replace by
    the PSD polar factor average, then add diagonal jitter until Cholesky
    succeeds."""
    a = np.asarray(a, dtype=np.float64)
    b = (a + a.T) / 2
    _, s, vt = np.linalg.svd(b)
    h = vt.T @ np.diag(s) @ vt
    a2 = (b + h) / 2
    a3 = (a2 + a2.T) / 2

    if is_pos_def(a3):
        return a3

    spacing = f(np.linalg.norm(a))
    eye = np.eye(a.shape[0])
    k = 1
    while not is_pos_def(a3):
        mineig = np.min(np.real(np.linalg.eigvals(a3)))
        a3 += eye * (-mineig * k**2 + spacing)
        k += 1
    return a3
