"""On-device validation + throughput for the dense chain-tile blocked-Gibbs
kernel (ops/resident_walk_dense.py::make_resident_gibbs_dense) against the
scanned Gibbs on the XOR MLP(2,2,1) posterior: pooled posterior moments,
mean and per-sub-block acceptance.

Usage: python benchmarks/validate_dense_gibbs.py
Appends to benchmarks/DENSE_RESULTS.json. TPU-only.
"""

import json
import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_eeyore")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from validate_resident import (  # noqa: E402
    C, T, BURNIN, DT, MOMENT_CHAINS, compare, mlp_model, run_scanned,
    summarize, xor_data,
)

from eeyore_tpu.ops.resident_walk_dense import make_resident_gibbs_dense  # noqa: E402
from eeyore_tpu.samplers import Gibbs  # noqa: E402

SCALE = 0.5


def run_dense(model, num_chains=C):
    fn = jax.jit(make_resident_gibbs_dense(
        model, *map(np.asarray, xor_data()), scales=SCALE, num_iters=T,
        num_burnin_iters=BURNIN, chain_block=8192))
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (num_chains, model.num_params), dtype=DT)
    samples, final, counts = fn(7, theta0s)
    jax.block_until_ready(final)
    t0 = time.perf_counter()
    samples, final, counts = fn(7, theta0s)
    jax.block_until_ready(final)
    elapsed = time.perf_counter() - t0
    sub = np.swapaxes(np.asarray(samples[:, :MOMENT_CHAINS, :], np.float64), 0, 1)
    counts = np.asarray(counts)  # [C, B]
    acc_rate = float(counts.mean()) / (T - BURNIN)
    res = summarize(sub, acc_rate, elapsed, num_chains, T)
    res["block_acceptance"] = (counts.mean(axis=0) / (T - BURNIN)).round(4).tolist()
    return res


def main():
    model = mlp_model([2, 2, 1])
    x, y = xor_data()

    dense = run_dense(model)
    scan = run_scanned(Gibbs(model, scales=SCALE), (x, y))
    out = compare("gibbs_mlp221_xor_dense_vs_scanned", dense, scan)
    out["dense_block_acceptance"] = dense["block_acceptance"]

    path = Path(__file__).parent / "DENSE_RESULTS.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    results["gibbs_validation"] = out
    path.write_text(json.dumps(results, indent=2) + "\n")
    print("done")


if __name__ == "__main__":
    main()
