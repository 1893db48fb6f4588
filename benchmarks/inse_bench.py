"""INSE vectorization benchmark (VERDICT round-2 item 7).

Times the vectorized ``inse_mc_cov`` (pair-sum batched matmuls + decimated
FFT deep-lag pass, stats/mc_cov.py) against the pre-vectorization
matmul-per-lag implementation on AR(1) chains of the huge-run sizes this
framework produces. CPU-only. Writes benchmarks/INSE_RESULTS.json.
"""

import json
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from eeyore_tpu.linalg import is_pos_def
from eeyore_tpu.stats.mc_cov import inse_mc_cov

OUT = Path(__file__).parent / "INSE_RESULTS.json"


def ar1_chain(n, p, rho, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, p))
    x = np.empty((n, p))
    x[0] = e[0]
    c = np.sqrt(1 - rho**2)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + c * e[i]
    return x


def per_lag_inse(x):
    """The pre-vectorization implementation: one matmul per lag, two lags
    per stopping-rule step (the round-2 stats/mc_cov.py)."""
    x = np.asarray(x, dtype=np.float64)
    xc = x - x.mean(0)
    n, p = x.shape

    def lac(lag):
        if lag >= n:
            return np.zeros((p, p))
        return (xc[: n - lag].T @ xc[lag:]) / n

    ub = n // 2
    sn = ub
    sig = None
    nm = 0
    for m in range(ub):
        nm += 1
        gam = lac(2 * m) + lac(2 * m + 1)
        gam = (gam + gam.T) / 2
        sig = (-lac(0) + 2 * gam) if m == 0 else sig + 2 * gam
        if is_pos_def(sig):
            sn = m
            break
    if sn > ub - 1:
        raise RuntimeError("Not enough samples")
    last_det = np.linalg.det(sig)
    for m in range(sn + 1, ub):
        nm += 1
        gam = lac(2 * m) + lac(2 * m + 1)
        gam = (gam + gam.T) / 2
        sig1 = sig + 2 * gam
        det1 = np.linalg.det(sig1)
        if det1 <= last_det:
            break
        sig, last_det = sig1, det1
    return sig, nm


def main():
    results = {}
    configs = [
        ("50000x10_rho0.995", 50000, 10, 0.995),
        ("50000x10_rho0.999", 50000, 10, 0.999),
        ("50000x10_rho0.9995", 50000, 10, 0.9995),
        ("100000x10_rho0.9995", 100000, 10, 0.9995),
        ("200000x20_rho0.999", 200000, 20, 0.999),
    ]
    inse_mc_cov(ar1_chain(5000, 4, 0.9))  # warm scipy fft
    for name, n, p, rho in configs:
        x = ar1_chain(n, p, rho)
        t0 = time.perf_counter()
        s_old, nm = per_lag_inse(x)
        t_old = time.perf_counter() - t0
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            s_new = inse_mc_cov(x)
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        err = float(np.max(np.abs(s_new - s_old)) / np.max(np.abs(s_old)))
        results[name] = {
            "stopping_m": nm,
            "per_lag_s": round(t_old, 4),
            "vectorized_s": round(best, 4),
            "speedup": round(t_old / best, 2),
            "max_rel_diff": err,
            "exact": err < 1e-12,
        }
        print(json.dumps({name: results[name]}), flush=True)
    OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
