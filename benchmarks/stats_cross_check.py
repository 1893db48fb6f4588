"""Head-to-head cross-validation of the diagnostics stack against the
REFERENCE implementations (torch, imported from the read-only mount), on
identical float64 chains.

The reference validates its stats against R's mcmcse via example scripts
(/root/reference/examples/stats/{inse_mc_cov.r,multi_ess.r,...}); here the
same role is played by the reference itself as the oracle: every estimator
must agree to float64 round-off (they implement the same formulas —
inse_mc_cov.py:9-83, multi_ess.py:6-14, multi_rhat.py:10-40,
discrepancy.py:3-19 — ours vectorized, theirs looped).

CPU-only. Writes benchmarks/STATS_PARITY.md.
"""

import sys
import types

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

kanga = types.ModuleType("kanga")
kanga_chains = types.ModuleType("kanga.chains")
kanga_chains.ChainArray = object
kanga.chains = kanga_chains
sys.modules.setdefault("kanga", kanga)
sys.modules.setdefault("kanga.chains", kanga_chains)
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# the reference's adjust path calls torch.symeig, removed in modern torch
# (SURVEY.md section 7.4 known-deprecated APIs); shim it with the documented
# replacement (old default upper=True -> UPLO='U')
def _symeig(A, eigenvectors=False, upper=True):
    L, V = torch.linalg.eigh(A, UPLO="U" if upper else "L")
    return (L, V) if eigenvectors else (L, torch.zeros_like(A))


torch.symeig = _symeig  # modern torch ships only a raising stub

import eeyore.stats as ref_st
import eeyore.kernels as ref_k

import eeyore_tpu.stats as st
import eeyore_tpu.kernels as k


def ar1_chains(num_chains=4, n=600, p=3, rho=0.65, seed=5):
    rng = np.random.default_rng(seed)
    chains = np.zeros((num_chains, n, p))
    for c in range(num_chains):
        x = np.zeros((n, p))
        x[0] = rng.normal(size=p)
        noise = rng.normal(size=(n, p)) * np.sqrt(1 - rho**2)
        for i in range(1, n):
            x[i] = rho * x[i - 1] + noise[i]
        chains[c] = x + 0.1 * c  # distinct chain means exercise R-hat's B
    return chains


def main():
    chains = ar1_chains()
    x = chains[0]
    tx = torch.from_numpy(x)
    rows = []

    def check(name, ours, ref, tol=1e-9):
        ours = np.asarray(ours, dtype=np.float64)
        ref = np.asarray(ref, dtype=np.float64)
        diff = float(np.max(np.abs(ours - ref)))
        scale = float(np.max(np.abs(ref))) or 1.0
        ok = diff <= tol * max(1.0, scale)
        rows.append((name, f"{diff:.3e}", f"{tol:g}", "PASS" if ok else "FAIL"))
        print(rows[-1], flush=True)
        return ok

    ok = True
    ok &= check("cov", st.cov(x, rowvar=False), ref_st.cov(tx, rowvar=False))
    ok &= check("cor", st.cor(x, rowvar=False), ref_st.cor(tx, rowvar=False))
    ok &= check("inse_mc_cov", st.inse_mc_cov(x), ref_st.inse_mc_cov(tx))
    ok &= check("inse_mc_cov adjust", st.inse_mc_cov(x, adjust=True),
                ref_st.inse_mc_cov(tx, adjust=True))
    ok &= check("mc_cov iid", st.mc_cov(x, method="iid", rowvar=False),
                ref_st.mc_cov(tx, method="iid", rowvar=False))
    ok &= check("mc_se inse", st.mc_se(x, method="inse", rowvar=False),
                ref_st.mc_se(tx, method="inse", rowvar=False))
    ok &= check("multi_ess inse", st.multi_ess(x, method="inse"),
                ref_st.multi_ess(tx, method="inse"), tol=1e-8)
    ok &= check("multi_ess iid", st.multi_ess(x, method="iid"),
                ref_st.multi_ess(tx, method="iid"), tol=1e-8)

    rhat_ours = st.multi_rhat(chains, method="inse")[0]
    rhat_ref = ref_st.multi_rhat(torch.from_numpy(chains), method="inse")[0]
    ok &= check("multi_rhat inse", rhat_ours, rhat_ref, tol=1e-8)

    # MMD with the three function kernels (Gram loops vs batched gram)
    y = chains[1][:120]
    x_s = x[:120]
    for name, ours_k, ref_kernel in [
        ("mmd iso_se", k.IsoSEKernel(), ref_k.IsoSEKernel()),
        ("mmd rq", k.RQKernel(), ref_k.RQKernel()),
        ("mmd periodic", k.PeriodicKernel(), ref_k.PeriodicKernel()),
    ]:
        ok &= check(name, st.mmd(x_s, y, ours_k),
                    ref_st.mmd(torch.from_numpy(x_s), torch.from_numpy(y), ref_kernel),
                    tol=1e-8)
        from eeyore.stats.discrepancy import squared_mmd as ref_squared_mmd

        ok &= check(name.replace("mmd", "sq_mmd unbiased"),
                    st.squared_mmd(x_s, y, ours_k, biased=False),
                    ref_squared_mmd(torch.from_numpy(x_s), torch.from_numpy(y),
                                    ref_kernel, biased=False), tol=1e-8)

    md = ["# Diagnostics parity: ours vs the reference's torch implementations",
          "",
          "Identical float64 AR(1) chains through both stacks; max-abs "
          "difference must be at float64 round-off (relative tol per row).",
          "",
          "| statistic | max abs diff | rel tol | status |",
          "|---|---|---|---|"]
    for r in rows:
        md.append("| " + " | ".join(r) + " |")
    md += ["", f"**Overall: {'PASS' if ok else 'FAIL'}**"]
    out = Path(__file__).parent / "STATS_PARITY.md"
    out.write_text("\n".join(md) + "\n")
    print("overall:", "PASS" if ok else "FAIL")
    print("wrote", out)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
