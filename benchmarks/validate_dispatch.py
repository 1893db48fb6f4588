"""On-device check that the PUBLIC API reaches the kernel backends
(round-4 VERDICT item 2): the reference-shaped workflow — SamplerHarness /
sample_chains with default backend="auto" — must hit kernel-class
throughput on the BASELINE configs and match the scanned path's statistics.

Configs (same shapes as validate_resident.py so compiles hit the
persistent cache):
- config 1: MH mlp221/XOR, 32768 chains -> dense kernel;
- config 3: HMC mlp433/iris, 16384 chains -> sublane resident kernel
  (streamed vg, cb 256);
- harness.run single chain on XOR HMC -> one dense chain_block, chain 0.

Usage: python benchmarks/validate_dispatch.py
Writes benchmarks/DISPATCH_RESULTS.json. TPU-only.
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
    mlp_model, iris_data, xor_data,
)

from eeyore_tpu.samplers import HMC, MetropolisHastings, SamplerHarness, sample_chains  # noqa: E402
from eeyore_tpu.samplers.dispatch import resolve_backend  # noqa: E402

OUT = Path(__file__).parent / "DISPATCH_RESULTS.json"


def timed_chains(kernel, data, C, T, burnin, backend):
    key = jax.random.PRNGKey(0)
    theta0s = 0.1 * jax.random.normal(key, (C, kernel.model.num_params),
                                      dtype=jnp.float32)
    # record sample+accepted only (the scanned default would also hold
    # grad_val on-device: at 16k chains x 1024 kept x 27 params that alone
    # is 1.8GB and OOMs next to the kernel run's buffers)
    kw = dict(record_keys=("sample", "accepted"), return_arrays=True,
              backend=backend)
    chains = sample_chains(kernel, key, theta0s, data, T, burnin, **kw)
    jax.block_until_ready(chains["sample"])
    del chains
    t0 = time.perf_counter()
    chains = sample_chains(kernel, key, theta0s, data, T, burnin, **kw)
    jax.block_until_ready(chains["sample"])
    elapsed = time.perf_counter() - t0
    samples = np.asarray(chains["sample"][:2048], np.float64)
    accepted = np.asarray(chains["accepted"], np.float64)
    del chains
    return {
        "samples_per_s": round(C * T / elapsed, 1),
        "pooled_mean": samples.mean(axis=(0, 1)),
        "mean_se": samples.mean(axis=1).std(axis=0, ddof=1) / np.sqrt(2048),
        "acceptance": round(float(accepted.mean()), 4),
    }


def check(tag, kernel, data, C, T, burnin, expect_backend, min_speedup):
    plan, reason = resolve_backend(kernel, data, C, T, burnin)
    assert plan is not None and plan.backend == expect_backend, (tag, reason)
    auto = timed_chains(kernel, data, C, T, burnin, "auto")
    scan = timed_chains(kernel, data, C, T, burnin, "scan")
    diff = np.abs(auto["pooled_mean"] - scan["pooled_mean"])
    tol = 6.0 * np.sqrt(auto["mean_se"] ** 2 + scan["mean_se"] ** 2) + 1e-3
    out = {
        "backend": plan.backend,
        "chain_block": plan.chain_block,
        "auto_sps": auto["samples_per_s"],
        "scan_sps": scan["samples_per_s"],
        "speedup": round(auto["samples_per_s"] / scan["samples_per_s"], 2),
        "auto_acceptance": auto["acceptance"],
        "scan_acceptance": scan["acceptance"],
        "moments_match": bool(np.all(diff < tol)),
        "acceptance_match": bool(abs(auto["acceptance"]
                                     - scan["acceptance"]) < 0.02),
        "kernel_class": bool(auto["samples_per_s"]
                             > min_speedup * scan["samples_per_s"]),
    }
    print(json.dumps({tag: out}), flush=True)
    return out


def main():
    results = {}
    x, y = xor_data()
    results["config1_mh_auto"] = check(
        "config1_mh_auto", MetropolisHastings(mlp_model([2, 2, 1]), scale=0.1),
        (x, y), 32768, 2048, 1024, "dense", 2.0)

    from eeyore_tpu.models import mlp as mlp_mod

    xi, yi = iris_data()
    iris_hmc = HMC(mlp_model([4, 3, 3], loss="multiclass_classification",
                             acts=[mlp_mod.sigmoid, None]),
                   step=0.02, num_steps=8)
    results["config3_hmc_auto"] = check(
        "config3_hmc_auto", iris_hmc, (xi, yi), 16384, 2048, 1024,
        "resident", 2.0)

    # reference-shaped single-chain run(): kernel-class per-iteration wall
    h = SamplerHarness(HMC(mlp_model([2, 2, 1]), step=0.05, num_steps=10),
                       (x, y), theta0=0.1 * jnp.ones(9),
                       key=jax.random.PRNGKey(1))
    h.run(num_epochs=2048, num_burnin_epochs=1024)  # compile
    t0 = time.perf_counter()
    chain = h.run(num_epochs=2048, num_burnin_epochs=1024)
    wall = time.perf_counter() - t0
    results["harness_run_single_chain"] = {
        "kept": len(chain),
        "wall_s": round(wall, 4),
        "iters_per_s": round(2048 / wall, 1),
        "acceptance": round(float(chain.acceptance_rate()), 4),
    }
    print(json.dumps({"harness_run":
                      results["harness_run_single_chain"]}), flush=True)
    OUT.write_text(json.dumps(results, indent=2) + "\n")


def tempering_check():
    """Round-4 follow-up: PowerPosteriorSampler.run with backend='auto'
    routes even/odd ladders onto the whole-ladder resident kernel; compare
    cold-chain moments + wall against the scanned population path."""
    from eeyore_tpu.samplers import PowerPosteriorSampler

    x, y = xor_data()
    results = {}
    for tag, backend in (("auto", "auto"), ("scan", "scan")):
        pp = PowerPosteriorSampler(mlp_model([2, 2, 1]), num_chains=8,
                                   sampler="MALA",
                                   sampler_kwargs={"step": 0.05},
                                   between_step=10, swap_scheme="even_odd")
        key = jax.random.PRNGKey(0)
        theta0 = 0.1 * jnp.ones(9)
        chains = pp.run(key, theta0, (x, y), 2048, 1024, backend=backend)
        wall = None   # best-of-3: small walls swing 5x run-to-run on the
        for _ in range(3):  # tunnel (0.067s vs 0.45s observed)
            t0 = time.perf_counter()
            chains = pp.run(key, theta0, (x, y), 2048, 1024, backend=backend)
            w = time.perf_counter() - t0
            wall = w if wall is None else min(wall, w)
        cold = np.asarray(chains.get_chain(7, key="sample"), np.float64)
        results[tag] = {"wall_s": round(wall, 4),
                        "ladder_iters_per_s": round(2048 / wall, 1),
                        "cold_mean_norm": round(float(np.linalg.norm(cold.mean(0))), 4),
                        "cold_var_mean": round(float(cold.var(0).mean()), 4)}
        print(json.dumps({f"tempering_{tag}": results[tag]}), flush=True)
    # round 5: all_ladders=True returns every ladder the block computed —
    # same kernel run, chain_block/L independent ladders for cross-ladder
    # diagnostics (multi_rhat per rung) with no extra device work
    pp_all = PowerPosteriorSampler(mlp_model([2, 2, 1]), num_chains=8,
                                   sampler="MALA",
                                   sampler_kwargs={"step": 0.05},
                                   between_step=10, swap_scheme="even_odd")
    chains_all = pp_all.run(jax.random.PRNGKey(0), 0.1 * jnp.ones(9),
                            (x, y), 2048, 1024, all_ladders=True)
    t0 = time.perf_counter()
    chains_all = pp_all.run(jax.random.PRNGKey(0), 0.1 * jnp.ones(9),
                            (x, y), 2048, 1024, all_ladders=True)
    wall_all = time.perf_counter() - t0
    n_all = chains_all.num_chains()
    # cold rungs sit last within each 8-chain ladder: cross-ladder rhat
    # on a 64-ladder subset (INSE mc_cov per chain — keep the host side
    # proportionate)
    from eeyore_tpu import stats as st
    cold = np.stack([np.asarray(chains_all.get_chain(g * 8 + 7, key="sample"),
                                np.float64) for g in range(64)])
    rhat = float(st.multi_rhat(cold)[0])  # (psrf, ...) tuple
    results["all_ladders"] = {
        "num_chains": int(n_all),
        "num_ladders": int(n_all // 8),
        "wall_s": round(wall_all, 4),
        "cold_rung_max_rhat": round(rhat, 4),
        "effective_ladder_iters_per_s": round(
            (n_all // 8) * 2048 / wall_all, 1),
    }
    print(json.dumps({"all_ladders": results["all_ladders"]}), flush=True)
    results["speedup"] = round(results["auto"]["ladder_iters_per_s"]
                               / results["scan"]["ladder_iters_per_s"], 2)
    # cold-chain second moments agree loosely (different PRNG, 1 ladder of
    # 1024 kept draws each)
    results["var_ratio"] = round(results["auto"]["cold_var_mean"]
                                 / max(results["scan"]["cold_var_mean"], 1e-9), 3)
    print(json.dumps({"tempering_speedup": results["speedup"],
                      "var_ratio": results["var_ratio"]}), flush=True)
    existing = json.loads(OUT.read_text()) if OUT.exists() else {}
    existing["tempering_dispatch"] = results
    OUT.write_text(json.dumps(existing, indent=2) + "\n")


def nuts_gap_check():
    """Round-5 VERDICT item 1 'done' criterion: the dispatched NUTS rate
    must sit within ~10% of the raw maker's — measured at the SAME wall
    accounting (C * num_iters / s; the round-4 597M-vs-261M gap mixed
    denominators, see docs/PERF_NOTES.md round 5)."""
    from eeyore_tpu.ops.resident_nuts_dense import make_resident_nuts_dense
    from eeyore_tpu.samplers import NUTS
    from eeyore_tpu.tuners.dual_averaging import HMCDATuner

    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    C, T, BURN = 32768, 2048, 1024
    base = make_resident_nuts_dense(
        model, np.asarray(x), np.asarray(y), step=0.1, max_depth=3,
        num_iters=T, num_burnin_iters=BURN, chain_block=8192,
        tuner=HMCDATuner(d=0.8))
    raw_fn = jax.jit(lambda s, th: base(s, th))
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (C, model.num_params), jnp.float32)

    def wall(f, reps=4):
        out = f()
        jax.block_until_ready(out)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f()
            jax.block_until_ready(out)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return best

    raw_s = wall(lambda: raw_fn(7, theta0s))
    kernel = NUTS(model, step=0.1, max_depth=3, fixed_budget=True,
                  tuner=HMCDATuner(d=0.8))
    key = jax.random.PRNGKey(0)

    def api(keys):
        return sample_chains(kernel, key, theta0s, (x, y), T, BURN,
                             record_keys=keys, return_arrays=True,
                             backend="dense")

    api_sample_s = wall(lambda: api(("sample",)))
    api_acc_s = wall(lambda: api(("sample", "accepted")))
    out = {
        "raw_sps": round(C * T / raw_s, 1),
        "api_samples_sps": round(C * T / api_sample_s, 1),
        "api_accepted_sps": round(C * T / api_acc_s, 1),
        "api_over_raw": round(raw_s / api_sample_s, 3),
        "api_accepted_over_raw": round(raw_s / api_acc_s, 3),
        "gap_closed": bool(api_sample_s < raw_s * 1.1
                           and api_acc_s < raw_s * 1.15),
    }
    print(json.dumps({"nuts_dispatch_gap": out}), flush=True)
    existing = json.loads(OUT.read_text()) if OUT.exists() else {}
    existing["nuts_dispatch_gap"] = out
    # the ad-hoc round-4 entries used a different denominator; superseded
    existing.pop("nuts_fixed_dispatch_32k", None)
    existing.pop("nuts_fixed_dispatch_32k_samples_only", None)
    OUT.write_text(json.dumps(existing, indent=2) + "\n")


if __name__ == "__main__":
    if "--tempering" in sys.argv:
        tempering_check()
    elif "--nuts" in sys.argv:
        nuts_gap_check()
    else:
        main()
