"""On-device validation + throughput for the dense chain-tile parallel-
tempering kernel (ops/resident_tempering_dense.py) against the sublane
resident kernel (itself validated vs the scanned even/odd PowerPosterior in
validate_resident.py): coldest-rung moments, within-chain acceptance, swap
rates, plus the equal-temperature swap-algebra pin.

Usage: python benchmarks/validate_dense_tempering.py
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
    C, T, BURNIN, DT, MOMENT_CHAINS, compare, mlp_model, summarize, xor_data,
)

from eeyore_tpu.ops.resident_tempering import make_resident_tempering  # noqa: E402
from eeyore_tpu.ops.resident_tempering_dense import (  # noqa: E402
    make_resident_tempering_dense,
)

L, BETWEEN = 8, 10


def run_tempering(make_fn, model, num_chains, num_iters=T, burnin=BURNIN):
    fn = jax.jit(make_fn)
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (num_chains, model.num_params), dtype=DT)
    samples, final, counts = fn(7, theta0s)
    jax.block_until_ready(final)
    t0 = time.perf_counter()
    samples, final, counts = fn(7, theta0s)
    jax.block_until_ready(final)
    elapsed = time.perf_counter() - t0

    cold = slice(L - 1, None, L)
    sub = np.swapaxes(np.asarray(samples[:, cold][:, :MOMENT_CHAINS, :],
                                 dtype=np.float64), 0, 1)
    counts = np.asarray(counts)
    within_rate = float(counts[:, 0].mean()) / (num_iters - burnin)
    rounds = np.arange(burnin, num_iters)
    rounds = rounds[rounds % BETWEEN == 0]
    parities = (rounds // BETWEEN) % 2
    rung = np.arange(num_chains) % L
    eligible = np.where(rung % 2 == 0, (parities == 0).sum(), (parities == 1).sum())
    eligible = np.where(rung == L - 1, 0, eligible)
    lower = eligible > 0
    swap_rate = float((counts[lower, 1] / eligible[lower]).mean())
    res = summarize(sub, within_rate, elapsed, num_chains, num_iters)
    res["swap_rate"] = swap_rate
    return res


def main():
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    xn, yn = np.asarray(x), np.asarray(y)
    num_chains = C // 2  # 2048 ladders of 8 rungs

    dense = run_tempering(
        make_resident_tempering_dense(model, xn, yn, num_rungs=L, step=0.05,
                                      sampler="MALA", between_step=BETWEEN,
                                      num_iters=T, num_burnin_iters=BURNIN,
                                      chain_block=8192),
        model, num_chains)
    sublane = run_tempering(
        make_resident_tempering(model, xn, yn, num_rungs=L, step=0.05,
                                sampler="MALA", between_step=BETWEEN,
                                num_iters=T, num_burnin_iters=BURNIN,
                                chain_block=2048),
        model, num_chains)
    out = compare("tempering_mlp221_xor_dense_vs_sublane", dense, sublane)
    out["dense_swap_rate"] = round(dense["swap_rate"], 4)
    out["sublane_swap_rate"] = round(sublane["swap_rate"], 4)
    out["swap_rate_match"] = bool(abs(dense["swap_rate"] - sublane["swap_rate"]) < 0.02)

    # swap-algebra pin: equal temperatures => every eligible swap accepts
    fn_eq = jax.jit(make_resident_tempering_dense(
        model, xn, yn, num_rungs=L, step=0.05, sampler="MALA",
        temperatures=np.ones(L), between_step=BETWEEN,
        num_iters=256, num_burnin_iters=0, chain_block=8192))
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (8192, model.num_params), dtype=DT)
    _, _, counts_eq = fn_eq(11, theta0s)
    counts_eq = np.asarray(counts_eq)
    rounds = np.arange(256)
    rounds = rounds[rounds % BETWEEN == 0]
    parities = (rounds // BETWEEN) % 2
    rung = np.arange(8192) % L
    eligible = np.where(rung % 2 == 0, (parities == 0).sum(), (parities == 1).sum())
    eligible = np.where(rung == L - 1, 0, eligible)
    out["equal_temp_swaps_all_accept"] = bool(np.all(counts_eq[:, 1] == eligible))
    print(json.dumps({"equal_temp_swaps_all_accept":
                      out["equal_temp_swaps_all_accept"]}), flush=True)

    path = Path(__file__).parent / "DENSE_RESULTS.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    results["tempering_validation"] = out
    path.write_text(json.dumps(results, indent=2) + "\n")
    print("done")


if __name__ == "__main__":
    main()
