"""Resident-kernel generality check: the data-on-sublanes whole-loop kernels
on a THIRD statistical problem — Bayesian logistic regression on the Swiss
banknotes dataset (n=200, 6 features; reference
examples/samplers/logistic_regression/banknotes/) — validated against the
scanned path: pooled posterior moments, acceptance, throughput.

The resident kernels are generated from the model architecture
(ops/mlp_math.py extract_arch), so nothing here is new code — this records
evidence that the Pallas path is not specialized to the XOR/iris configs.

Usage: python benchmarks/validate_lr_banknotes.py
Writes benchmarks/LR_RESULTS.json. TPU-only.
"""

import json
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_eeyore")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from validate_resident import DT, compare, run_resident, run_scanned  # noqa: E402

from eeyore_tpu.datasets import XYDataset  # noqa: E402
from eeyore_tpu.models import LogisticRegression, loss_functions  # noqa: E402
from eeyore_tpu.models import logistic_regression as lr  # noqa: E402
from eeyore_tpu.ops.resident_walk import make_resident_mala, make_resident_mh  # noqa: E402
from eeyore_tpu.samplers import MALA, MetropolisHastings  # noqa: E402

C, T, BURNIN = 16384, 2048, 1024


def model_and_data():
    ds = XYDataset.from_eeyore("banknotes")
    # standardized features for a well-conditioned posterior (the raw
    # banknote measurements are ~130-215; see examples/logistic_regression)
    x = (ds.x - ds.x.mean(0)) / ds.x.std(0)
    model = LogisticRegression(loss=loss_functions["binary_classification"],
                               hparams=lr.Hyperparameters(input_size=6),
                               dtype=DT)
    return model, (jnp.asarray(x, DT), jnp.asarray(ds.y, DT))


def main():
    model, (x, y) = model_and_data()
    xn, yn = np.asarray(x), np.asarray(y)
    results = {}

    # chain_block 1024: the unrolled forward+backward holds ~12 live
    # [200, chain_block] activation arrays — 2048 lanes blows the 16MB
    # scoped-VMEM budget (measured 19.96M)
    # chain_block 1024: the unrolled forward+backward holds ~12 live
    # [200, chain_block] activation arrays — 2048 lanes blows the 16MB
    # scoped-VMEM budget (measured 19.96M)
    res = run_resident(
        make_resident_mala(model, xn, yn, step=0.01, num_iters=T,
                           num_burnin_iters=BURNIN, chain_block=1024),
        model, num_chains=C)
    scan = run_scanned(MALA(model, step=0.01), (x, y),
                       num_iters=T, burnin=BURNIN, num_chains=C)
    results["mala"] = compare("mala_lr_banknotes", res, scan)

    res = run_resident(
        make_resident_mh(model, xn, yn, scale=0.1, num_iters=T,
                         num_burnin_iters=BURNIN, chain_block=2048),
        model, num_chains=C)
    scan = run_scanned(MetropolisHastings(model, scale=0.1), (x, y),
                       num_iters=T, burnin=BURNIN, num_chains=C)
    results["mh"] = compare("mh_lr_banknotes", res, scan)

    path = Path(__file__).parent / "LR_RESULTS.json"
    path.write_text(json.dumps(results, indent=2) + "\n")
    print("done")


if __name__ == "__main__":
    main()
