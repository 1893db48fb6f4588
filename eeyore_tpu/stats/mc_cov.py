"""Monte-Carlo covariance estimators for correlated MCMC samples.

``inse_mc_cov`` is the initial-sequence (INSE) multivariate estimator of
Dai & Jones 2017 (reference: /root/reference/eeyore/stats/inse_mc_cov.py:9-83,
following the notation of the R package mcmcse's insec.cpp). The reference
computes each lag-pair autocovariance with O(n p^2) Python loops of outer
products. Here the lag-pair matrices are produced by a vectorized provider
(`_GammaProvider`) built for the huge chains this framework generates:

- **Pair-sum algebra**: the estimator only ever consumes
  ``Gamma_m = gamma_{2m} + gamma_{2m+1}`` (symmetrized), never the individual
  lags. With ``u[i] = x[i] + x[i+1]`` (zero-padded), ``Gamma_m =
  x[:n-2m].T @ u[2m:] / n`` — ONE matmul per m instead of two.
- **Batched shallow lags**: Gamma blocks are computed lazily in geometrically
  growing batches with a single strided ``np.matmul`` (no copies — each lag's
  window is a contiguous row-slice view), amortizing BLAS call overhead.
- **FFT deep lags**: if the determinant-stopping rule is still running at
  ``m >= _FFT_SWITCH_M``, ALL remaining Gamma_m up to n//2 are produced by
  one decimated FFT cross-correlation pass: even/odd subsequences of x and u
  give stride-2 lags from half-length transforms, and the p(p+1)/2
  *symmetrized pair* spectra ``conj(Fx_a) Fu_b + conj(Fx_b) Fu_a`` are
  inverted directly — O(p^2 n log n) total instead of O(n^2 p^2).
  (scipy.fft with ``workers=-1`` when available, else numpy.fft.)

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

try:  # scipy.fft is multithreaded (workers=-1) and has next_fast_len
    from scipy import fft as _sfft
except Exception:  # pragma: no cover - scipy is in the image, but stay safe
    _sfft = None

# switch the Gamma provider to the one-shot FFT pass once the stopping rule
# has consumed this many pair-lags (the FFT pass costs ~p^2 length-n
# transforms ~ a few dozen direct Gamma matmuls)
_FFT_SWITCH_M = 48
# below this chain length the direct path is always cheap enough
_FFT_MIN_N = 4096


def _lag_autocov(x_ctr, lag):
    """gamma_lag = (1/n) sum_i x_ctr[i] outer x_ctr[i+lag]; one matmul."""
    n = x_ctr.shape[0]
    if lag >= n:
        return np.zeros((x_ctr.shape[1], x_ctr.shape[1]))
    return (x_ctr[: n - lag].T @ x_ctr[lag:]) / n


class _GammaProvider:
    """Lazy supplier of Gamma_m = gamma_{2m} + gamma_{2m+1} (UNsymmetrized;
    the caller symmetrizes) for a centered chain x_ctr [n, p]."""

    def __init__(self, x_ctr):
        self.x = np.ascontiguousarray(x_ctr)
        n, p = self.x.shape
        self.n, self.p = n, p
        # pair-sum u[i] = x[i] + x[i+1], u[n-1] = x[n-1]
        self.u = np.empty_like(self.x)
        np.add(self.x[:-1], self.x[1:], out=self.u[: n - 1])
        self.u[n - 1] = self.x[n - 1]
        self._blocks = {}  # m0 -> [B, p, p] batch starting at pair-lag m0
        self._block_starts = []
        self._next_m = 0
        self._next_B = 8
        self._fft_all = None  # [m_cap, p, p] once the FFT pass has run

    def gamma(self, m):
        """Gamma_m (pair-sum, unsymmetrized). m < n//2."""
        if self._fft_all is not None and m < self._fft_all.shape[0]:
            return self._fft_all[m]
        while m >= self._next_m and self._fft_all is None:
            if self.n >= _FFT_MIN_N and self._next_m >= _FFT_SWITCH_M:
                self._fft_all = self._fft_gammas(self._cap_for(m))
                return self._fft_all[m]
            self._direct_block(self._next_m, self._next_B)
            self._next_m += self._next_B
            self._next_B = min(2 * self._next_B, 256)
        if self._fft_all is not None:  # ran past the capped FFT pass: redo
            self._fft_all = self._fft_gammas(self._cap_for(m))
            return self._fft_all[m]
        i = np.searchsorted(self._block_starts, m, side="right") - 1
        m0 = self._block_starts[i]
        return self._blocks[m0][m - m0]

    def _cap_for(self, m):
        """Lag cap for the FFT pass: well past the current demand (the
        determinant loop rarely runs much deeper), but never more than the
        n//2 the estimator can consume. Growing the cap later only redoes
        the (cheap) assembly, not the transforms' asymptotics."""
        return min(self.n // 2, max(4096, 8 * (m + 1)))

    def _direct_block(self, m0, B):
        """Gamma_{m0}..Gamma_{m0+B-1} with one batched matmul over strided
        contiguous window views of the zero-padded pair-sum sequence."""
        n, p = self.n, self.p
        rows = n - 2 * m0
        if rows <= 0:
            self._blocks[m0] = np.zeros((B, p, p))
            self._block_starts.append(m0)
            return
        # window m0+k starts at row 2k of u[2*m0:]; rows beyond the valid
        # range for deeper lags must read zeros, so pad by 2(B-1)
        z = np.concatenate([self.u[2 * m0:], np.zeros((2 * (B - 1), p))])
        s0, s1 = z.strides
        w = np.lib.stride_tricks.as_strided(z, (B, rows, p), (2 * s0, s0, s1))
        self._blocks[m0] = np.matmul(self.x[:rows].T, w) / n
        self._block_starts.append(m0)

    def _fft_gammas(self, m_cap):
        """Gamma_m for m in [0, m_cap) via decimated FFT cross-correlation.

        Gamma_m[a,b] = sum_i x[i,a] u[i+2m,b]
                     = sum_j xe[j,a] ue[j+m,b] + sum_j xo[j,a] uo[j+m,b]
        with xe/xo (ue/uo) the even/odd-index subsequences — stride-2 lags
        from half-length transforms. The full symmetrized spectrum
        S[f,a,b] = T_ab + T_ba (T_uv = conj(Fx_u) Fu_v, even + odd parts)
        is inverted in one batched irfft per column chunk, so the result is
        written contiguously with no scatter; the caller's
        (Gamma + Gamma.T)/2 is then the identity (the diagonal's double
        count cancels against the /2 of the symmetrized average).
        """
        n, p = self.n, self.p
        xe, xo = self.x[0::2], self.x[1::2]
        ue, uo = self.u[0::2], self.u[1::2]
        ne = xe.shape[0]
        # circular correlation is alias-free for lags < m_cap once
        # nfft >= ne + m_cap; deeper caps (rare) redo the pass with a
        # larger transform
        nfft_min = ne + m_cap
        if _sfft is not None:
            nfft = _sfft.next_fast_len(nfft_min, real=True)
            rfft = lambda a: _sfft.rfft(a, nfft, axis=0, workers=-1)
            irfft = lambda a: _sfft.irfft(a, nfft, axis=0, workers=-1)
        else:
            nfft = 1 << int(np.ceil(np.log2(max(nfft_min, 2))))
            rfft = lambda a: np.fft.rfft(a, nfft, axis=0)
            irfft = lambda a: np.fft.irfft(a, nfft, axis=0)
        Fxe, Fxo = rfft(xe), rfft(xo)
        Fue, Fuo = rfft(ue), rfft(uo)
        cFxe, cFxo = np.conj(Fxe), np.conj(Fxo)
        out = np.empty((m_cap, p, p))
        # chunk the row axis 'a' so spectrum temporaries stay ~100MB
        ka = max(1, min(p, int(4e6 / max(nfft * p, 1)) or 1))
        scale = 1.0 / (2.0 * n)
        for a0 in range(0, p, ka):
            a1 = min(p, a0 + ka)
            S = (cFxe[:, a0:a1, None] * Fue[:, None, :]
                 + cFxo[:, a0:a1, None] * Fuo[:, None, :]
                 + Fue[:, a0:a1, None] * cFxe[:, None, :]
                 + Fuo[:, a0:a1, None] * cFxo[:, None, :])
            c = irfft(S.reshape(S.shape[0], -1))[:m_cap]
            out[:, a0:a1, :] = c.reshape(m_cap, a1 - a0, p) * scale
        return out


def inse_mc_cov(x, adjust=False):
    x = np.asarray(x, dtype=np.float64)
    x_ctr = x - x.mean(axis=0)
    n, p = x.shape

    ub = n // 2
    sn = ub

    gamadj = np.zeros((p, p)) if adjust else None

    provider = _GammaProvider(x_ctr)

    def gamma_sym(m):
        g = provider.gamma(m)
        return (g + g.T) / 2

    sig = None
    for m in range(ub):
        gam = gamma_sym(m)

        if m == 0:
            gam0 = _lag_autocov(x_ctr, 0)
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
        gam = gamma_sym(m)

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
