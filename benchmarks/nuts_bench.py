"""NUTS at scale on TPU: vmapped no-u-turn trajectories on the XOR MLP(2,2,1)
posterior, against fixed-trajectory HMC on the same problem.

NUTS is a beyond-reference capability (the reference ships only HMC's
init-step heuristic and the dual-averaging tuner, hmc.py:38-77); this
records what it costs and buys at chain scale: samples/s, gradient evals
per transition (dynamic), ESS/s, against HMC spending a comparable gradient
budget with a hand-picked trajectory.

Usage: python benchmarks/nuts_bench.py
Writes benchmarks/NUTS_RESULTS.json. TPU (works on CPU too, slowly).
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

from eeyore_tpu import stats as st  # noqa: E402
from eeyore_tpu.models import MLP, loss_functions, mlp  # noqa: E402
from eeyore_tpu.samplers import HMC, NUTS  # noqa: E402
from eeyore_tpu.samplers.runner import run_fn  # noqa: E402
from eeyore_tpu.datasets import BatchSchedule  # noqa: E402
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

C = 4096
T = 2048
BURNIN = 1024
ESS_CHAINS = 24


def run(kernel, schedule, record):
    fn = jax.jit(jax.vmap(run_fn(kernel, schedule, T, BURNIN, record)))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, C)
    theta0s = 0.1 * jax.random.normal(key, (C, kernel.model.num_params),
                                      dtype=jnp.float32)
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    samples = np.asarray(rec["sample"], dtype=np.float64)  # [C, kept, P]
    ess = []
    for c in range(ESS_CHAINS):
        try:
            ess.append(st.multi_ess(samples[c], method="inse"))
        except RuntimeError:
            pass
    mean_ess = float(np.mean(ess)) if ess else float("nan")
    out = {
        "samples_per_s": round(C * T / elapsed, 1),
        "ess_per_s": round(mean_ess * C / elapsed, 1),
        "mean_chain_ess": round(mean_ess, 1),
        "elapsed_s": round(elapsed, 3),
    }
    return out, rec, state


def main():
    x = jnp.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], jnp.float32)
    y = jnp.asarray([[0.], [1.], [1.], [0.]], jnp.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    schedule = BatchSchedule.full_batch(x, y)
    results = {}

    nuts = NUTS(model, step=0.1, max_depth=8, tuner=HMCDATuner(d=0.8),
                num_burnin_iters=BURNIN)
    out, rec, state = run(nuts, schedule,
                          ("sample", "accept_stat", "num_leapfrogs", "divergent"))
    grads = np.asarray(rec["num_leapfrogs"], dtype=np.float64)
    out["mean_leapfrogs_per_transition"] = round(float(grads.mean()), 2)
    out["grad_evals_per_s"] = round(out["samples_per_s"] * float(grads.mean()), 1)
    out["accept_stat"] = round(float(np.asarray(rec["accept_stat"]).mean()), 4)
    out["divergence_rate"] = round(float(np.asarray(rec["divergent"]).mean()), 5)
    out["tuned_step_mean"] = round(float(np.asarray(state.step).mean()), 4)
    results["nuts_mlp221_xor"] = out
    print(json.dumps({"nuts_mlp221_xor": out}), flush=True)

    # fixed-budget NUTS (static control flow: no lockstep while_loop
    # penalty — every transition costs exactly 2^max_depth - 1 leapfrogs).
    # max_depth=3 gives a 7-leapfrog budget, matching the adaptive run's
    # ~5.8 mean; same tuner target.
    global C
    for chains, tag in ((C, "nuts_fixed_d3_mlp221_xor"),
                        (32768, "nuts_fixed_d3_32k")):
        saved = C
        C = chains
        try:
            nuts_f = NUTS(model, step=0.1, max_depth=3, fixed_budget=True,
                          tuner=HMCDATuner(d=0.8), num_burnin_iters=BURNIN)
            fout, frec, fstate = run(nuts_f, schedule,
                                     ("sample", "accept_stat", "num_leapfrogs",
                                      "divergent"))
            fgrads = np.asarray(frec["num_leapfrogs"], dtype=np.float64)
            fout["mean_leapfrogs_per_transition"] = round(float(fgrads.mean()), 2)
            fout["budget_leapfrogs"] = 7
            fout["accept_stat"] = round(float(np.asarray(frec["accept_stat"]).mean()), 4)
            fout["divergence_rate"] = round(float(np.asarray(frec["divergent"]).mean()), 5)
            fout["tuned_step_mean"] = round(float(np.asarray(fstate.step).mean()), 4)
            fout["speedup_vs_adaptive_sps"] = round(
                fout["samples_per_s"] / out["samples_per_s"], 1)
            fout["ess_per_sample_ratio_vs_adaptive"] = round(
                (fout["mean_chain_ess"]) / out["mean_chain_ess"], 3)
            results[tag] = fout
            print(json.dumps({tag: fout}), flush=True)
        finally:
            C = saved

    # HMC with a comparable gradient budget per transition
    budget = max(1, int(round(out["mean_leapfrogs_per_transition"])))
    hmc = HMC(model, step=0.05, num_steps=budget)
    hout, hrec, _ = run(hmc, schedule, ("sample", "accepted"))
    hout["num_steps"] = budget
    hout["acceptance"] = round(float(np.asarray(hrec["accepted"]).mean()), 4)
    results["hmc_same_grad_budget"] = hout
    print(json.dumps({"hmc_same_grad_budget": hout}), flush=True)

    results["nuts_vs_hmc_ess_per_s"] = round(
        out["ess_per_s"] / hout["ess_per_s"], 3)
    path = Path(__file__).parent / "NUTS_RESULTS.json"
    path.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps({"nuts_vs_hmc_ess_per_s": results["nuts_vs_hmc_ess_per_s"]}))


if __name__ == "__main__":
    main()
