"""In-kernel target_val/accepted recording (round 5): device validation.

For each kernel family (dense MALA, sublane HMC, dense fixed-budget NUTS),
request ``record_keys=("sample", "accepted", "target_val")`` through the
public sample_chains and check:

- target_val == model.log_target recomputed at the recorded samples
  (the oracle's matmul forward is a DIFFERENT f32 op order than the
  kernels' unrolled FMA chains: measured ~5e-5 relative — tolerance 1e-4),
- accepted matches moved-vs-previous derived flags on rows 1.. (row 0's
  kernel flag is the true first-iteration moved indicator, which the
  derived pass cannot know),
- the extras path's throughput cost vs the default sample-only contract.

Writes benchmarks/RECORD_EXTRAS_RESULTS.json. TPU.
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

from validate_resident import iris_data, mlp_model, xor_data  # noqa: E402

from eeyore_tpu.models import mlp as mlp_mod  # noqa: E402
from eeyore_tpu.samplers import HMC, MALA, NUTS, sample_chains  # noqa: E402
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

OUT = Path(__file__).parent / "RECORD_EXTRAS_RESULTS.json"


def check(tag, kernel, data, C, T, burn, val_rtol):
    key = jax.random.PRNGKey(0)
    theta0s = 0.1 * jax.random.normal(key, (C, kernel.model.num_params),
                                      jnp.float32)

    def run(keys):
        rec = sample_chains(kernel, key, theta0s, data, T, burn,
                            record_keys=keys, return_arrays=True)
        jax.block_until_ready(rec["sample"])
        return rec

    rec = run(("sample", "accepted", "target_val"))
    t0 = time.perf_counter()
    rec = run(("sample", "accepted", "target_val"))
    extras_s = time.perf_counter() - t0
    lean = run(("sample",))
    t0 = time.perf_counter()
    lean = run(("sample",))
    lean_s = time.perf_counter() - t0

    # oracle: recompute log_target at a chain subset (f64 on host reference
    # is a DIFFERENT precision schedule; compare against the model's own
    # f32 forward on device instead)
    sub = jnp.asarray(rec["sample"][:256])          # [256, kept, P]
    xj, yj = jnp.asarray(data[0]), jnp.asarray(data[1])
    oracle = jax.jit(jax.vmap(jax.vmap(
        lambda t: kernel.model.log_target(t, xj, yj))))(sub)
    got = np.asarray(rec["target_val"][:256], np.float64)
    want = np.asarray(oracle, np.float64)
    denom = np.maximum(np.abs(want), 1.0)
    val_err = float(np.max(np.abs(got - want) / denom))

    acc = np.asarray(rec["accepted"][:256])
    samples = np.asarray(rec["sample"][:256])
    derived = np.any(samples[:, 1:, :] != samples[:, :-1, :], axis=-1)
    acc_match = bool(np.array_equal(acc[:, 1:].astype(bool), derived))

    out = {
        "val_rel_err": val_err,
        "val_ok": bool(val_err < val_rtol),
        "accepted_matches_derived_rows1plus": acc_match,
        "accept_rate": round(float(acc.mean()), 4),
        "extras_wall_s": round(extras_s, 4),
        "lean_wall_s": round(lean_s, 4),
        "extras_cost_frac": round(extras_s / lean_s - 1.0, 4),
    }
    print(json.dumps({tag: out}), flush=True)
    existing = json.loads(OUT.read_text()) if OUT.exists() else {}
    existing[tag] = out
    OUT.write_text(json.dumps(existing, indent=2) + "\n")
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    x, y = xor_data()
    if which in ("mala", "all"):
        check("dense_mala_xor", MALA(mlp_model([2, 2, 1]), step=0.01),
              (x, y), 32768, 2048, 1024, 1e-4)
    if which in ("hmc", "all"):
        xi, yi = iris_data()
        check("sublane_hmc_iris",
              HMC(mlp_model([4, 3, 3], loss="multiclass_classification",
                            acts=[mlp_mod.sigmoid, None]),
                  step=0.02, num_steps=8),
              (np.asarray(xi), np.asarray(yi)), 16384, 2048, 1024, 2e-4)
    if which in ("nuts", "all"):
        check("dense_nuts_xor",
              NUTS(mlp_model([2, 2, 1]), step=0.1, max_depth=3,
                   fixed_budget=True, tuner=HMCDATuner(d=0.8)),
              (x, y), 32768, 2048, 1024, 1e-4)


if __name__ == "__main__":
    main()
