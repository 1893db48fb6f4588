"""Statistical parity: reference eeyore vs eeyore_tpu on identical problems.

Runs BOTH frameworks (the reference imported from its read-only mount with a
stubbed kanga) on the same targets with matched settings, and checks that
posterior means agree within combined Monte-Carlo error and acceptance rates
agree closely — the north-star acceptance criterion ("posterior moments,
acceptance rates, and MC-SE diagnostics must match the eeyore reference
within Monte-Carlo error").

Writes benchmarks/PARITY_RESULTS.md. Runs on CPU (reference is torch-CPU;
ours is forced to the CPU platform for apples-to-apples statistics).
"""

import sys
import types

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# ---- reference side ----
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

import jax.numpy as jnp


def run_reference_bvn(sampler_name, num_epochs=11000, burnin=1000):
    from torch.utils.data import DataLoader

    from eeyore.datasets import EmptyXYDataset
    from eeyore.models import DistributionModel as RefDist
    from eeyore.chains import ChainList as RefChainList
    from eeyore.samplers import HMC as RefHMC, MALA as RefMALA, MetropolisHastings as RefMH

    torch.manual_seed(0)
    cov = torch.tensor([[1.0, 0.5], [0.5, 1.0]], dtype=torch.float64)
    prec = torch.inverse(cov)

    def log_pdf(theta, x, y):
        return -0.5 * theta @ prec @ theta

    model = RefDist(log_pdf, 2, dtype=torch.float64)
    ds = EmptyXYDataset()
    loader = DataLoader(ds, batch_size=1)
    theta0 = torch.tensor([2.0, -2.0], dtype=torch.float64)
    if sampler_name == "MH":
        sampler = RefMH(model, theta0=theta0, dataloader=loader, chain=RefChainList())
    elif sampler_name == "MALA":
        sampler = RefMALA(model, theta0=theta0, dataloader=loader, step=0.5, chain=RefChainList())
    else:
        sampler = RefHMC(model, theta0=theta0, dataloader=loader, step=0.3, num_steps=10, chain=RefChainList())
    sampler.run(num_epochs=num_epochs, num_burnin_epochs=burnin, verbose=False)
    chain = sampler.get_chain()
    samples = chain.get_samples().numpy()
    return {
        "mean": samples.mean(0),
        "sd": samples.std(0),
        "acceptance": float(chain.acceptance_rate()),
        "n": len(samples),
    }


def run_ours_bvn(sampler_name, num_epochs=11000, burnin=1000):
    from eeyore_tpu.models import DistributionModel
    from eeyore_tpu.samplers import HMC, MALA, MetropolisHastings, sample_chain

    cov = np.array([[1.0, 0.5], [0.5, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    model = DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    kern = {"MH": lambda: MetropolisHastings(model, scale=1.0),
            "MALA": lambda: MALA(model, step=0.5),
            "HMC": lambda: HMC(model, step=0.3, num_steps=10)}[sampler_name]()
    chain = sample_chain(kern, jax.random.PRNGKey(0), jnp.asarray([2.0, -2.0]),
                         data, num_epochs, burnin)
    s = chain.get_samples()
    return {"mean": s.mean(0), "sd": s.std(0),
            "acceptance": chain.acceptance_rate(), "n": len(s)}


def run_reference_xor_mlp(num_epochs=6000, burnin=1000):
    from torch.utils.data import DataLoader

    from eeyore.constants import loss_functions as ref_losses
    from eeyore.datasets import XYDataset as RefXY
    from eeyore.models import mlp as ref_mlp
    from eeyore.chains import ChainList as RefChainList
    from eeyore.samplers import MALA as RefMALA

    torch.manual_seed(1)
    xor = RefXY.from_eeyore("xor", dtype=torch.float64)
    loader = DataLoader(xor, batch_size=len(xor))
    model = ref_mlp.MLP(loss=ref_losses["binary_classification"],
                        hparams=ref_mlp.Hyperparameters(dims=[2, 2, 1]),
                        dtype=torch.float64)
    theta0 = torch.zeros(model.num_params(), dtype=torch.float64)
    sampler = RefMALA(model, theta0=theta0, dataloader=loader, step=0.05, chain=RefChainList())
    sampler.run(num_epochs=num_epochs, num_burnin_epochs=burnin, verbose=False)
    chain = sampler.get_chain()
    samples = chain.get_samples().numpy()
    # the XOR posterior is symmetric/multimodal: compare functionals that are
    # invariant to the hidden-unit permutation symmetry
    ll = chain.get_target_vals().numpy()
    return {"mean_target": float(ll.mean()), "sd_target": float(ll.std()),
            "mean_theta_norm": float(np.linalg.norm(samples, axis=1).mean()),
            "acceptance": float(chain.acceptance_rate()), "n": len(samples)}


def run_ours_xor_mlp(num_epochs=6000, burnin=1000):
    from eeyore_tpu.models import MLP, loss_functions, mlp
    from eeyore_tpu.samplers import MALA, sample_chain

    x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
    kern = MALA(model, step=0.05)
    chain = sample_chain(kern, jax.random.PRNGKey(1), jnp.zeros(model.num_params),
                         (x, y), num_epochs, burnin)
    s = chain.get_samples()
    ll = chain.get_target_vals()
    return {"mean_target": float(ll.mean()), "sd_target": float(ll.std()),
            "mean_theta_norm": float(np.linalg.norm(s, axis=1).mean()),
            "acceptance": chain.acceptance_rate(), "n": len(s)}


def run_reference_pp(num_epochs=6000, burnin=1000, num_chains=5, between_step=2):
    """Reference PowerPosteriorSampler (categorical swaps) on the bivariate
    normal; reports the coldest (default-indicator) chain."""
    from torch.utils.data import DataLoader

    from eeyore.datasets import EmptyXYDataset
    from eeyore.models import DistributionModel as RefDist
    from eeyore.samplers import PowerPosteriorSampler as RefPP

    torch.manual_seed(3)
    cov = torch.tensor([[1.0, 0.5], [0.5, 1.0]], dtype=torch.float64)
    prec = torch.inverse(cov)

    def log_pdf(theta, x, y):
        return -0.5 * theta @ prec @ theta

    model = RefDist(log_pdf, 2, dtype=torch.float64)
    loader = DataLoader(EmptyXYDataset(), batch_size=1)
    # keys: the reference PP defaults to ['sample', 'target_val'] (no
    # 'accepted'), which breaks its own acceptance_rate(); request it
    sampler = RefPP(model, loader,
                    [["MALA", {"step": 0.25}] for _ in range(num_chains)],
                    theta0=torch.tensor([2.0, -2.0], dtype=torch.float64),
                    between_step=between_step,
                    keys=["sample", "target_val", "accepted"])
    sampler.run(num_epochs=num_epochs, num_burnin_epochs=burnin, verbose=False)
    chain = sampler.get_chain()  # coldest chain (default indicator)
    samples = chain.get_samples().numpy()
    # the reference records accepted=None on iterations where a swap reset
    # the sub-sampler state, which breaks its own acceptance_rate(); filter
    accs = []
    for s in sampler.samplers:
        vals = [int(v) for v in s.get_chain().vals["accepted"] if v is not None]
        accs.append(sum(vals) / max(len(vals), 1))
    return {"mean": samples.mean(0), "sd": samples.std(0),
            "acceptance": float(np.mean(accs)),
            "n": len(samples)}


def run_ours_pp(num_epochs=6000, burnin=1000, num_chains=5, between_step=2):
    """Our scanned PowerPosteriorSampler, categorical swap scheme (the
    reference's serial-sweep semantics)."""
    from eeyore_tpu.models import DistributionModel
    from eeyore_tpu.samplers import PowerPosteriorSampler

    cov = np.array([[1.0, 0.5], [0.5, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    model = DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    pp = PowerPosteriorSampler(model, num_chains=num_chains, sampler="MALA",
                               sampler_kwargs={"step": 0.25},
                               between_step=between_step,
                               swap_scheme="categorical")
    chains = pp.run(jax.random.PRNGKey(2), jnp.asarray([2.0, -2.0]), data,
                    num_epochs, burnin)
    cold = chains.get_samples()[num_chains - 1]  # coldest chain last
    all_acc = np.mean([np.mean(np.asarray(chains.get_chain(i, key="accepted")))
                       for i in range(num_chains)])
    return {"mean": np.asarray(cold).mean(0), "sd": np.asarray(cold).std(0),
            "acceptance": float(all_acc), "n": cold.shape[0]}


def mc_se_of_mean(sd, n, ess_fraction=0.05):
    """Conservative MC error of the mean assuming >= 5% ESS."""
    return sd / np.sqrt(n * ess_fraction)


def main():
    rows = []
    ok_all = True
    for name in ["MH", "MALA", "HMC"]:
        ref = run_reference_bvn(name)
        ours = run_ours_bvn(name)
        tol = 3 * (mc_se_of_mean(ref["sd"], ref["n"]) + mc_se_of_mean(ours["sd"], ours["n"]))
        mean_ok = bool(np.all(np.abs(ref["mean"] - ours["mean"]) < tol))
        acc_ok = abs(ref["acceptance"] - ours["acceptance"]) < 0.1
        ok_all &= mean_ok and acc_ok
        rows.append((f"bivariate normal / {name}",
                     np.round(ref["mean"], 3).tolist(), np.round(ours["mean"], 3).tolist(),
                     round(ref["acceptance"], 3), round(ours["acceptance"], 3),
                     mean_ok and acc_ok))
        print(rows[-1], flush=True)

    ref = run_reference_pp()
    ours = run_ours_pp()
    tol = 3 * (mc_se_of_mean(ref["sd"], ref["n"]) + mc_se_of_mean(ours["sd"], ours["n"]))
    mean_ok = bool(np.all(np.abs(ref["mean"] - ours["mean"]) < tol))
    acc_ok = abs(ref["acceptance"] - ours["acceptance"]) < 0.1
    ok_all &= mean_ok and acc_ok
    rows.append(("bivariate normal / PowerPosterior (5-rung MALA ladder, coldest chain)",
                 np.round(ref["mean"], 3).tolist(), np.round(ours["mean"], 3).tolist(),
                 round(ref["acceptance"], 3), round(ours["acceptance"], 3),
                 mean_ok and acc_ok))
    print(rows[-1], flush=True)

    ref = run_reference_xor_mlp()
    ours = run_ours_xor_mlp()
    # log-target mean is permutation-invariant; compare within generous MC error
    tol = 3 * (mc_se_of_mean(ref["sd_target"], ref["n"]) + mc_se_of_mean(ours["sd_target"], ours["n"]))
    t_ok = abs(ref["mean_target"] - ours["mean_target"]) < tol
    norm_ok = abs(ref["mean_theta_norm"] - ours["mean_theta_norm"]) / ref["mean_theta_norm"] < 0.2
    acc_ok = abs(ref["acceptance"] - ours["acceptance"]) < 0.15
    ok_all &= t_ok and norm_ok and acc_ok
    rows.append(("XOR mlp221 / MALA (perm-invariant functionals)",
                 [round(ref["mean_target"], 2), round(ref["mean_theta_norm"], 2)],
                 [round(ours["mean_target"], 2), round(ours["mean_theta_norm"], 2)],
                 round(ref["acceptance"], 3), round(ours["acceptance"], 3),
                 t_ok and norm_ok and acc_ok))
    print(rows[-1], flush=True)

    md = ["# Posterior parity: reference eeyore vs eeyore_tpu", "",
          "Same targets, matched sampler settings, both on CPU (reference f64 "
          "torch; ours f64 JAX). Means must agree within 3x combined "
          "conservative MC error; acceptance within 0.1.", "",
          "| problem | ref mean | ours mean | ref acc | ours acc | within MC error |",
          "|---|---|---|---|---|---|"]
    for r in rows:
        md.append("| " + " | ".join(str(v) for v in r) + " |")
    md += ["", f"**Overall: {'PASS' if ok_all else 'FAIL'}**"]
    out = Path(__file__).parent / "PARITY_RESULTS.md"
    out.write_text("\n".join(md) + "\n")
    print("overall:", "PASS" if ok_all else "FAIL")
    print("wrote", out)


if __name__ == "__main__":
    main()
