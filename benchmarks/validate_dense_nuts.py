"""On-device validation + throughput for the dense chain-tile fixed-budget
NUTS kernel (ops/resident_nuts_dense.py) against the scanned fixed-budget
NUTS (samplers/nuts.py fixed_budget=True) on the XOR MLP(2,2,1) posterior —
the benchmarks/NUTS_RESULTS.json config (max_depth 3, 7-leapfrog budget,
population dual-averaging at d=0.8).

Checks pooled posterior-moment agreement within cross-chain MC error and
trajectory-mean accept_stat within 0.02, then records samples/s and a
chain_block sweep. Usage:
  python benchmarks/validate_dense_nuts.py [--bench-only] [--sweep]
Writes benchmarks/DENSE_NUTS_RESULTS.json. TPU-only.
"""

import json
import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_eeyore")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from validate_resident import (  # noqa: E402
    ESS_CHAINS, MOMENT_CHAINS, mlp_model, summarize, xor_data,
)

from eeyore_tpu import stats as st  # noqa: E402
from eeyore_tpu.datasets import BatchSchedule  # noqa: E402
from eeyore_tpu.ops.resident_nuts_dense import make_resident_nuts_dense  # noqa: E402
from eeyore_tpu.samplers import NUTS  # noqa: E402
from eeyore_tpu.samplers.runner import run_fn  # noqa: E402
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

C = 32768
T = 2048
BURNIN = 1024
STEP = 0.1
MAX_DEPTH = 3


def run_dense(num_chains=C, num_iters=T, burnin=BURNIN, chain_block=8192,
              tuned=True, repeats=1):
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    tuner = HMCDATuner(d=0.8) if tuned else None
    fn = jax.jit(make_resident_nuts_dense(
        model, np.asarray(x), np.asarray(y), step=STEP, max_depth=MAX_DEPTH,
        num_iters=num_iters, num_burnin_iters=burnin, chain_block=chain_block,
        tuner=tuner))
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (num_chains, model.num_params),
                                      dtype=jnp.float32)
    samples, final, acc, div = fn(7, theta0s)
    jax.block_until_ready(final)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        samples, final, acc, div = fn(7, theta0s)
        jax.block_until_ready(final)
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    sub = np.asarray(samples[:, :MOMENT_CHAINS, :], dtype=np.float64)
    sub = np.swapaxes(sub, 0, 1)
    kept = num_iters - burnin
    acc_rate = float(np.asarray(acc).mean()) / kept
    out = summarize(sub, acc_rate, best, num_chains, num_iters)
    out["divergence_rate"] = float(np.asarray(div).mean()) / kept
    return out


def run_scanned_fixed(num_chains=C, num_iters=T, burnin=BURNIN):
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    schedule = BatchSchedule.full_batch(x, y)
    kernel = NUTS(model, step=STEP, max_depth=MAX_DEPTH, fixed_budget=True,
                  tuner=HMCDATuner(d=0.8), num_burnin_iters=burnin)
    kernel.recompute_current = False
    fn = jax.jit(jax.vmap(run_fn(kernel, schedule, num_iters, burnin,
                                 ("sample", "accept_stat", "divergent"))))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_chains)
    theta0s = 0.1 * jax.random.normal(key, (num_chains, model.num_params),
                                      dtype=jnp.float32)
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    sub = np.asarray(rec["sample"][:MOMENT_CHAINS], dtype=np.float64)
    acc_rate = float(np.asarray(rec["accept_stat"], dtype=np.float64).mean())
    out = summarize(sub, acc_rate, elapsed, num_chains, num_iters)
    out["divergence_rate"] = float(np.asarray(rec["divergent"]).mean())
    return out


def compare(name, res, scan):
    diff = np.abs(res["pooled_mean"] - scan["pooled_mean"])
    tol = 6.0 * np.sqrt(res["mean_se"] ** 2 + scan["mean_se"] ** 2) + 1e-3
    out = {
        "config": name,
        "dense_sps": round(res["samples_per_s"], 1),
        "scanned_sps": round(scan["samples_per_s"], 1),
        "speedup": round(res["samples_per_s"] / scan["samples_per_s"], 2),
        "dense_ess_per_s": round(res["ess_per_s"], 1),
        "scanned_ess_per_s": round(scan["ess_per_s"], 1),
        "dense_mean_chain_ess": round(res["mean_chain_ess"], 1),
        "scanned_mean_chain_ess": round(scan["mean_chain_ess"], 1),
        "dense_accept_stat": round(res["acceptance"], 4),
        "scanned_accept_stat": round(scan["acceptance"], 4),
        "dense_divergence_rate": round(res["divergence_rate"], 5),
        "scanned_divergence_rate": round(scan["divergence_rate"], 5),
        "max_moment_diff": float(diff.max()),
        "max_moment_tol": float(tol.max()),
        "moments_match": bool(np.all(diff < tol)),
        "acceptance_match": abs(res["acceptance"] - scan["acceptance"]) < 0.02,
    }
    print(json.dumps(out), flush=True)
    return out


def sweep_chain_block(num_chains=C, num_iters=512):
    out = {}
    for cb in (1024, 2048, 4096, 8192):
        res = run_dense(num_chains=num_chains, num_iters=num_iters, burnin=0,
                        chain_block=cb, tuned=False, repeats=3)
        out[f"cb{cb}"] = {"samples_per_s": round(res["samples_per_s"], 1)}
        print(json.dumps({f"cb{cb}": out[f"cb{cb}"]}), flush=True)
    return out


def main():
    if "--iris" in sys.argv:
        iris_case()
        return
    results = {}
    if "--sweep" in sys.argv:
        results["chain_block_sweep"] = sweep_chain_block()
    if "--bench-only" not in sys.argv:
        dense = run_dense()
        scan = run_scanned_fixed()
        results["validation"] = compare("nuts_fixed_d3_mlp221_xor_32k", dense, scan)
    # throughput at bench scale, untuned (pure sampling rate)
    res = run_dense(num_chains=131072, num_iters=256, burnin=0, tuned=False,
                    repeats=5)
    results["bench_131072x256"] = {
        "samples_per_s": round(res["samples_per_s"], 1),
        "accept_stat": round(res["acceptance"], 4),
    }
    print(json.dumps({"bench_131072x256": results["bench_131072x256"]}), flush=True)
    out_path = Path(__file__).parent / "DENSE_NUTS_RESULTS.json"
    existing = {}
    if out_path.exists():
        existing = json.loads(out_path.read_text())
    existing.update(results)
    out_path.write_text(json.dumps(existing, indent=2, default=str) + "\n")


def iris_case(num_chains=16384, num_iters=T, burnin=BURNIN):
    """Round-4 extension: the SUBLANE resident fixed-budget NUTS
    (ops/resident_nuts.py, streamed vg) on iris mlp433 vs the scanned
    fixed-budget form — NUTS at kernel rates for datasets too big to
    unroll densely."""
    from validate_resident import iris_data
    from eeyore_tpu.models import mlp as mlp_mod
    from eeyore_tpu.ops.resident_nuts import make_resident_nuts

    model = mlp_model([4, 3, 3], loss="multiclass_classification",
                      acts=[mlp_mod.sigmoid, None])
    xi, yi = iris_data()
    xn, yn = np.asarray(xi), np.asarray(yi)
    step = 0.02

    fn = jax.jit(make_resident_nuts(
        model, xn, yn, step=step, max_depth=MAX_DEPTH, num_iters=num_iters,
        num_burnin_iters=burnin, chain_block=256, tuner=HMCDATuner(d=0.8)))
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (num_chains, model.num_params),
                                      dtype=jnp.float32)
    samples, final, acc, div = fn(7, theta0s)
    jax.block_until_ready(final)
    t0 = time.perf_counter()
    samples, final, acc, div = fn(7, theta0s)
    jax.block_until_ready(final)
    elapsed = time.perf_counter() - t0
    sub = np.asarray(samples[:, :MOMENT_CHAINS, :], np.float64)
    sub = np.swapaxes(sub, 0, 1)
    kept = num_iters - burnin
    res = summarize(sub, float(np.asarray(acc).mean()) / kept, elapsed,
                    num_chains, num_iters)
    res["divergence_rate"] = float(np.asarray(div).mean()) / kept

    # scanned fixed-budget comparator
    schedule = BatchSchedule.full_batch(xi, yi)
    kernel = NUTS(model, step=step, max_depth=MAX_DEPTH, fixed_budget=True,
                  tuner=HMCDATuner(d=0.8), num_burnin_iters=burnin)
    kernel.recompute_current = False
    sfn = jax.jit(jax.vmap(run_fn(kernel, schedule, num_iters, burnin,
                                  ("sample", "accept_stat", "divergent"))))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_chains)
    state, rec = sfn(keys, theta0s)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, rec = sfn(keys, theta0s)
    jax.block_until_ready(state)
    s_elapsed = time.perf_counter() - t0
    ssub = np.asarray(rec["sample"][:MOMENT_CHAINS], np.float64)
    scan = summarize(ssub, float(np.asarray(rec["accept_stat"],
                                            np.float64).mean()),
                     s_elapsed, num_chains, num_iters)
    scan["divergence_rate"] = float(np.asarray(rec["divergent"]).mean())

    out = compare("nuts_fixed_d3_mlp433_iris_16k", res, scan)
    out_path = Path(__file__).parent / "DENSE_NUTS_RESULTS.json"
    existing = json.loads(out_path.read_text()) if out_path.exists() else {}
    existing["iris_sublane"] = out
    out_path.write_text(json.dumps(existing, indent=2, default=str) + "\n")


if __name__ == "__main__":
    main()
