"""Auto-budget NUTS end-to-end (round-4 VERDICT item 4) + frozen-metric
kernels (weak item 4): device validation.

1. xor_auto:  NUTS(max_depth="auto") through sample_chains(backend="auto")
   at 32k chains — the probe runs inside the sampler, the kernel runs at
   the probed (depth, step); moments compared against the scanned
   fixed-budget form at the SAME frozen budget.
2. iris_auto: same flow on the iris-class model (sublane kernel).
3. xor_auto_metric: NUTS(max_depth="auto", mass_adapt=True) — the probe
   freezes the warmup diagonal metric and the kernel runs with it
   (identity-metric parity is structural: inv_mass=None and all-ones fold
   to the same program); moments must match the identity-metric kernel
   within MC tolerance on this well-scaled posterior.

Usage: python benchmarks/validate_auto_nuts.py [xor|iris|metric]
Writes benchmarks/AUTO_NUTS_RESULTS.json. TPU.
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
from eeyore_tpu.samplers import NUTS, sample_chains  # noqa: E402
from eeyore_tpu.samplers.dispatch import resolve_backend  # noqa: E402
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

OUT = Path(__file__).parent / "AUTO_NUTS_RESULTS.json"
MOMENT_CHAINS = 2048


def moments(rec, P):
    sub = np.asarray(rec["sample"][:MOMENT_CHAINS], np.float64)
    return (sub.mean(axis=(0, 1)),
            sub.mean(axis=1).std(axis=0, ddof=1) / np.sqrt(sub.shape[0]))


def timed(kernel, key, theta0s, data, T, burn, backend, keys=("sample",)):
    kw = dict(record_keys=keys, return_arrays=True, backend=backend)
    rec = sample_chains(kernel, key, theta0s, data, T, burn, **kw)
    jax.block_until_ready(rec["sample"])
    t0 = time.perf_counter()
    rec = sample_chains(kernel, key, theta0s, data, T, burn, **kw)
    jax.block_until_ready(rec["sample"])
    return rec, time.perf_counter() - t0


def run_case(tag, model, data, C, T, burn, expect_backend, mass_adapt=False):
    kernel = NUTS(model, step=0.1, max_depth="auto", tuner=HMCDATuner(d=0.8),
                  mass_adapt=mass_adapt)
    key = jax.random.PRNGKey(0)
    theta0s = 0.1 * jax.random.normal(key, (C, model.num_params), jnp.float32)

    t0 = time.perf_counter()
    kernel.resolve_auto_budget(data, key=key)   # the probe (timed once)
    probe_s = time.perf_counter() - t0
    print(json.dumps({f"{tag}_probe": {"depth": kernel.max_depth,
                                       "step": round(float(kernel.step0), 5),
                                       "wall_s": round(probe_s, 2)}}),
          flush=True)
    plan, reason = resolve_backend(kernel, data, C, T, burn)
    assert plan is not None and plan.backend == expect_backend, (tag, reason)

    rec, auto_s = timed(kernel, key, theta0s, data, T, burn, "auto")
    print(json.dumps({f"{tag}_auto_sps": round(C * T / auto_s, 1)}),
          flush=True)
    mean_a, se_a = moments(rec, model.num_params)

    # scanned fixed-budget reference at the SAME frozen budget
    ref = NUTS(model, step=kernel.step0, max_depth=kernel.max_depth,
               fixed_budget=True, tuner=HMCDATuner(d=0.8),
               mass_adapt=False)
    ref_c = min(C, 4096)
    rec_s, scan_s = timed(ref, key, theta0s[:ref_c], data, T, burn, "scan")
    mean_s, se_s = moments(rec_s, model.num_params)

    diff = np.abs(mean_a - mean_s)
    tol = 6.0 * np.sqrt(se_a ** 2 + se_s ** 2) + 1e-3
    out = {
        "probed_depth": kernel.max_depth,
        "probed_step": round(float(kernel.step0), 5),
        "probe_wall_s": round(probe_s, 2),
        "backend": plan.backend,
        "auto_sps": round(C * T / auto_s, 1),
        "scan_sps": round(ref_c * T / scan_s, 1),
        "speedup_per_chain": round((C * T / auto_s) / (ref_c * T / scan_s), 2),
        "max_moment_diff": float(diff.max()),
        "moments_match": bool(np.all(diff < tol)),
    }
    if mass_adapt:
        im = np.asarray(kernel._frozen_inv_mass)
        out["frozen_inv_mass_range"] = [round(float(im.min()), 4),
                                        round(float(im.max()), 4)]
    print(json.dumps({tag: out}), flush=True)
    existing = json.loads(OUT.read_text()) if OUT.exists() else {}
    existing[tag] = out
    OUT.write_text(json.dumps(existing, indent=2) + "\n")
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    x, y = xor_data()
    if which in ("xor", "all"):
        run_case("xor_auto", mlp_model([2, 2, 1]), (x, y),
                 32768, 2048, 1024, "dense")
    if which in ("iris", "all"):
        xi, yi = iris_data()
        run_case("iris_auto",
                 mlp_model([4, 3, 3], loss="multiclass_classification",
                           acts=[mlp_mod.sigmoid, None]),
                 (np.asarray(xi), np.asarray(yi)), 16384, 2048, 1024,
                 "resident")
    if which in ("metric", "all"):
        run_case("xor_auto_metric", mlp_model([2, 2, 1]), (x, y),
                 32768, 2048, 1024, "dense", mass_adapt=True)


if __name__ == "__main__":
    main()
