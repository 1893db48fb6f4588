"""On-device validation + throughput for the dense chain-tile resident HMC
kernel (ops/resident_hmc_dense.py) against the data-on-sublanes resident
kernel and the scanned XLA path, on the headline problem (HMC, MLP(2,2,1),
XOR, step 0.05, 10 leapfrog steps).

Usage: python benchmarks/validate_dense.py [--bench-only]
Writes benchmarks/DENSE_RESULTS.json. TPU-only.
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
    C, T, BURNIN, compare, mlp_model, run_resident, run_scanned, xor_data,
)

from eeyore_tpu.ops.resident_hmc import make_resident_hmc  # noqa: E402
from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense  # noqa: E402
from eeyore_tpu.samplers import HMC  # noqa: E402

STEP, NUM_STEPS = 0.05, 10


def validate():
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    xn, yn = np.asarray(x), np.asarray(y)

    dense = run_resident(
        make_resident_hmc_dense(model, xn, yn, step=STEP, num_steps=NUM_STEPS,
                                num_iters=T, num_burnin_iters=BURNIN,
                                chain_block=8192),
        model)
    scan = run_scanned(HMC(model, step=STEP, num_steps=NUM_STEPS), (x, y))
    return compare("hmc_mlp221_xor_dense_vs_scanned", dense, scan)


def bench(num_chains=131072, num_iters=256, repeats=3):
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    xn, yn = np.asarray(x), np.asarray(y)
    out = {}
    for name, maker, kwargs in [
        ("dense", make_resident_hmc_dense, dict(chain_block=8192)),
        ("sublane", make_resident_hmc, dict(chain_block=8192)),
    ]:
        fn = jax.jit(maker(model, xn, yn, step=STEP, num_steps=NUM_STEPS,
                           num_iters=num_iters, num_burnin_iters=0, **kwargs))
        theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                          (num_chains, model.num_params),
                                          dtype=jnp.float32)
        samples, final, acc = fn(7, theta0s)
        jax.block_until_ready(final)
        best = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            samples, final, acc = fn(7, theta0s)
            jax.block_until_ready(final)
            best = max(best, num_chains * num_iters / (time.perf_counter() - t0))
        acc_rate = float(np.asarray(acc).mean()) / num_iters
        out[name] = {"samples_per_s": round(best, 1), "acceptance": round(acc_rate, 4)}
        print(json.dumps({name: out[name]}), flush=True)
    out["dense_speedup"] = round(out["dense"]["samples_per_s"]
                                 / out["sublane"]["samples_per_s"], 3)
    return out


def main():
    results = {}
    if "--bench-only" not in sys.argv:
        results["validation"] = validate()
    results["bench_131072x256"] = bench()
    out_path = Path(__file__).parent / "DENSE_RESULTS.json"
    out_path.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps({"dense_speedup": results["bench_131072x256"]["dense_speedup"]}))


if __name__ == "__main__":
    main()
