"""Adaptive-tempering resident SMC validation + throughput (VERDICT item 6).

Runs the resident-mutation SMC on the BASELINE config-5 problem (XOR
MLP(2,2,1), N=16384 particles) two ways:

- the round-2 fixed quartic ladder (20 stages, 5 MALA mutation steps), and
- betas="adaptive" (ESS-bisection next temperature, same mutation budget
  per stage),

checking both reach the same log-evidence and weighted posterior moments,
and recording wall-clock + effective particle-stage-mutations/s. The
adaptive ladder needs several-fold fewer stages for the same result, which
is where the per-stage launch overhead the round-2 notes flagged actually
goes away. Writes into benchmarks/DENSE_RESULTS.json under
"smc_adaptive". TPU-only.
"""

import json
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_eeyore")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.ops.resident_smc import make_resident_smc

N = 16384
MSTEPS = 5


def weighted_stats(particles, log_w):
    w = np.asarray(jax.nn.softmax(jnp.asarray(log_w)), dtype=np.float64)
    p = np.asarray(particles, dtype=np.float64)
    mean = (w[:, None] * p).sum(0)
    return mean


def main():
    x = np.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], np.float32)
    y = np.asarray([[0.], [1.], [1.], [0.]], np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)

    out = {}

    def run_config(tag, betas):
        runner = make_resident_smc(
            model, x, y, num_particles=N, betas=betas,
            num_mutation_steps=MSTEPS, mutation="MALA", mutation_step=0.1,
            chain_block=4096)
        runner(0)  # compile
        t0 = time.perf_counter()
        particles, log_w, diags = runner(1)
        elapsed = time.perf_counter() - t0
        stages = len(np.asarray(diags["beta"]))
        res = {
            "stages": stages,
            "elapsed_s": round(elapsed, 4),
            "mutations_per_s": round(N * stages * MSTEPS / elapsed, 1),
            "log_evidence": round(diags["log_evidence"], 3),
            "final_weight_ess": round(diags["final_weight_ess"], 1),
            "mean_mutation_acceptance": round(
                float(np.asarray(diags["mutation_acceptance"]).mean()), 4),
            "betas": [round(float(b), 5) for b in np.asarray(diags["beta"])],
            "posterior_mean": [round(v, 4) for v in
                               weighted_stats(particles, log_w)],
        }
        out[tag] = res
        print(json.dumps({tag: res}), flush=True)
        return res

    fixed = run_config("fixed_quartic_20",
                       [(i / 20) ** 4 for i in range(21)])
    adapt = run_config("adaptive", "adaptive")

    out["evidence_match"] = bool(
        abs(fixed["log_evidence"] - adapt["log_evidence"]) < 0.1)
    out["stage_reduction"] = round(fixed["stages"] / adapt["stages"], 2)
    out["wall_speedup_same_result"] = round(
        fixed["elapsed_s"] / adapt["elapsed_s"], 2)
    mom_diff = float(np.max(np.abs(
        np.asarray(fixed["posterior_mean"]) - np.asarray(adapt["posterior_mean"]))))
    out["max_posterior_mean_diff"] = round(mom_diff, 4)
    print(json.dumps({k: out[k] for k in
                      ("evidence_match", "stage_reduction",
                       "wall_speedup_same_result", "max_posterior_mean_diff")}),
          flush=True)

    path = Path(__file__).parent / "DENSE_RESULTS.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    results["smc_adaptive"] = out
    path.write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
