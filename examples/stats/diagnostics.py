"""Diagnostics walkthrough: cov/cor, INSE vs iid MC covariance, MC-SE,
multivariate ESS and R-hat on simulated AR(1) chains.

Mirrors /root/reference/examples/stats/ (cov.py, cor.py, inse_mc_cov.py,
multi_ess.py, multi_rhat.py — there cross-validated against R's mcmcse;
here against the analytic AR(1) autocovariance).
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import numpy as np

from eeyore_tpu import stats as st
from eeyore_tpu.chains import ChainLists


def ar1(n, p, rho, rng):
    x = np.zeros((n, p))
    x[0] = rng.normal(size=p)
    noise = rng.normal(size=(n, p)) * np.sqrt(1 - rho**2)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + noise[i]
    return x


def main():
    rng = np.random.default_rng(0)
    rho = 0.7
    chains = np.stack([ar1(4000, 2, rho, rng) for _ in range(4)])

    x = chains[0]
    print("cov:\n", st.cov(x).round(3))
    print("cor:\n", st.cor(x).round(3))
    print("iid mc_cov:\n", st.mc_cov(x, method="iid").round(3))
    print("INSE mc_cov:\n", st.mc_cov(x, method="inse").round(3))
    # AR(1): asymptotic variance = (1+rho)/(1-rho) * stationary variance
    print("analytic asymptotic var:", round((1 + rho) / (1 - rho), 3))
    print("mc_se:", st.mc_se(x).round(3))
    print("multi_ess:", round(st.multi_ess(x)))
    print("ESS fraction (analytic (1-rho)/(1+rho) = "
          f"{(1-rho)/(1+rho):.3f}):", round(st.multi_ess(x) / len(x), 3))

    rhat, imag, w, b, w_pd, b_pd = st.multi_rhat(chains)
    print(f"multi_rhat: {rhat:.4f} (W pd={w_pd}, B pd={b_pd})")

    cl = ChainLists.from_arrays({
        "sample": chains,
        "target_val": np.zeros(chains.shape[:2]),
        "accepted": np.ones(chains.shape[:2], dtype=int),
    })
    print("summary:", {k: np.round(v, 3) if isinstance(v, np.ndarray) else round(v, 3)
                       for k, v in cl.summary(keys=("mean", "mc_se", "acceptance",
                                                    "multi_ess", "multi_rhat")).items()})


if __name__ == "__main__":
    main()
