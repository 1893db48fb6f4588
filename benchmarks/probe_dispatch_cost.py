"""Decompose the fixed per-run dispatch cost (round-4 VERDICT item 7 +
round-5 finding: sample_chains(backend='dense') walls 0.254s where the
underlying jit walls 0.106s — the ~0.15s is host-side dispatch overhead,
not device work).

Pieces timed (NUTS dense config, 32k chains):
  rtt          — np.asarray on an already-materialized tiny device array
                 (one device->host fetch through the axon tunnel)
  resolve      — resolve_backend alone (includes np.asarray of x/y)
  seed         — _seed_from_key (device randint + int() fetch)
  fingerprint  — cache-key construction (_data_fingerprint + _freeze)
  jit_call     — the cached compiled fn itself (device wall)
  full         — run_kernel_backend end-to-end
  api          — sample_chains(..., backend='dense') end-to-end

Writes benchmarks/DISPATCH_COST.json. TPU.
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

from validate_resident import mlp_model, xor_data  # noqa: E402

from eeyore_tpu.datasets import as_schedule  # noqa: E402
from eeyore_tpu.samplers import NUTS, sample_chains  # noqa: E402
from eeyore_tpu.samplers.dispatch import (  # noqa: E402
    _data_fingerprint, _freeze, _seed_from_key, resolve_backend,
    run_kernel_backend,
)
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

C, T, BURNIN = 32768, 2048, 1024
REPS = 10

OUT = Path(__file__).parent / "DISPATCH_COST.json"


def best_of(f, reps=REPS):
    f()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    kernel = NUTS(model, step=0.1, max_depth=3, fixed_budget=True,
                  tuner=HMCDATuner(d=0.8))
    key = jax.random.PRNGKey(0)
    theta0s = 0.1 * jax.random.normal(key, (C, model.num_params),
                                      dtype=jnp.float32)
    schedule = as_schedule((x, y))
    xb = jnp.asarray(schedule.x[0]) + 0.0
    jax.block_until_ready(xb)

    results = {}

    results["rtt_tiny_fetch"] = best_of(lambda: np.asarray(xb))

    results["resolve"] = best_of(lambda: resolve_backend(
        kernel, schedule, C, T, BURNIN, 1, backend="dense"))

    results["seed_from_key"] = best_of(lambda: _seed_from_key(key))

    xn, yn = np.asarray(schedule.x[0]), np.asarray(schedule.y[0])
    plan, _ = resolve_backend(kernel, schedule, C, T, BURNIN, 1,
                              backend="dense")
    results["fingerprint"] = best_of(
        lambda: (_data_fingerprint(xn, yn), _freeze(plan.kwargs)))

    # warm the backend cache, then time the full dispatch and the bare jit
    run_kernel_backend(kernel, key, theta0s, schedule, T, BURNIN, plan,
                       needs_accepted=False)
    fn = next(iter(kernel._backend_cache.values()))

    def jit_call():
        out = fn(7, theta0s)
        jax.block_until_ready(out)

    results["jit_call"] = best_of(jit_call)

    def full():
        rec, info = run_kernel_backend(kernel, key, theta0s, schedule, T,
                                       BURNIN, plan, needs_accepted=False)
        jax.block_until_ready(rec["sample"])

    results["full_run_kernel_backend"] = best_of(full)

    def api():
        rec = sample_chains(kernel, key, theta0s, (x, y), T, BURNIN,
                            record_keys=("sample",), return_arrays=True,
                            backend="dense")
        jax.block_until_ready(rec["sample"])

    results["api_sample_chains"] = best_of(api)

    results = {k: round(v, 5) for k, v in results.items()}
    results["overhead_full_minus_jit"] = round(
        results["full_run_kernel_backend"] - results["jit_call"], 5)
    results["overhead_api_minus_jit"] = round(
        results["api_sample_chains"] - results["jit_call"], 5)
    print(json.dumps(results, indent=2))
    OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
