"""Measure the reference eeyore's CPU throughput (the baseline to beat).

The reference publishes no numbers (BASELINE.md), so this script RUNS the
reference implementation from its read-only mount (/root/reference) on the
BASELINE.json configs and records samples/s. A stub satisfies its `kanga`
import (not installed here; only needed for plotting conversions).

Results are written to benchmarks/baseline_cpu.json, which bench.py uses as
the vs_baseline denominator.
"""

import json
import sys
import time
import types

from pathlib import Path

# stub kanga before importing the reference
kanga = types.ModuleType("kanga")
kanga_chains = types.ModuleType("kanga.chains")
kanga_chains.ChainArray = object
kanga.chains = kanga_chains
sys.modules.setdefault("kanga", kanga)
sys.modules.setdefault("kanga.chains", kanga_chains)

sys.path.insert(0, "/root/reference")

import torch
from torch.utils.data import DataLoader

from eeyore.constants import loss_functions
from eeyore.datasets import XYDataset
from eeyore.models import mlp
from eeyore.samplers import HMC, MALA, MetropolisHastings


def time_run(sampler, num_epochs, num_burnin_epochs):
    start = time.perf_counter()
    sampler.run(num_epochs=num_epochs, num_burnin_epochs=num_burnin_epochs, verbose=False)
    elapsed = time.perf_counter() - start
    return num_epochs / elapsed, elapsed


def bench_mlp221_hmc(num_epochs=2000, burnin=200, dtype=torch.float64):
    torch.manual_seed(0)
    xor = XYDataset.from_eeyore('xor', dtype=dtype)
    loader = DataLoader(xor, batch_size=len(xor))
    model = mlp.MLP(loss=loss_functions['binary_classification'],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=dtype)
    sampler = HMC(model, theta0=model.prior.sample(), dataloader=loader,
                  step=0.05, num_steps=10)
    return time_run(sampler, num_epochs, burnin)


def bench_mlp221_mh(num_epochs=4000, burnin=400, dtype=torch.float64):
    torch.manual_seed(0)
    xor = XYDataset.from_eeyore('xor', dtype=dtype)
    loader = DataLoader(xor, batch_size=len(xor))
    model = mlp.MLP(loss=loss_functions['binary_classification'],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=dtype)
    sampler = MetropolisHastings(model, theta0=model.prior.sample(), dataloader=loader)
    return time_run(sampler, num_epochs, burnin)


def bench_iris_mala(num_epochs=2000, burnin=200, dtype=torch.float32):
    torch.manual_seed(0)
    iris = XYDataset.from_eeyore('iris', yndmin=1, dtype=dtype, yonehot=True)
    loader = DataLoader(iris, batch_size=len(iris))
    model = mlp.MLP(loss=loss_functions['multiclass_classification'],
                    hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                                activations=[torch.sigmoid, None]),
                    dtype=dtype)
    sampler = MALA(model, theta0=model.prior.sample(), dataloader=loader, step=0.003)
    return time_run(sampler, num_epochs, burnin)


def bench_iris_hmc(num_epochs=500, burnin=50, dtype=torch.float32):
    torch.manual_seed(0)
    iris = XYDataset.from_eeyore('iris', yndmin=1, dtype=dtype, yonehot=True)
    loader = DataLoader(iris, batch_size=len(iris))
    model = mlp.MLP(loss=loss_functions['multiclass_classification'],
                    hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                                activations=[torch.sigmoid, None]),
                    dtype=dtype)
    sampler = HMC(model, theta0=model.prior.sample(), dataloader=loader,
                  step=0.01, num_steps=10)
    return time_run(sampler, num_epochs, burnin)


if __name__ == "__main__":
    torch.set_num_threads(torch.get_num_threads())
    results = {}
    for name, fn in [("hmc_mlp221_xor_f64", bench_mlp221_hmc),
                     ("mh_mlp221_xor_f64", bench_mlp221_mh),
                     ("mala_mlp433_iris_f32", bench_iris_mala),
                     ("hmc_mlp433_iris_f32", bench_iris_hmc)]:
        sps, elapsed = fn()
        results[name] = {"samples_per_s": sps, "elapsed_s": elapsed}
        print(f"{name}: {sps:.1f} samples/s ({elapsed:.1f}s)")

    out = Path(__file__).parent / "baseline_cpu.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {out}")
