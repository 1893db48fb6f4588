"""On-device validation + throughput for the dense chain-tile MH and MALA
kernels (ops/resident_walk_dense.py) against the scanned XLA paths and the
data-on-sublanes resident kernels, plus dense-HMC dispatch-overhead probes
(raw outputs, larger chain blocks) at the headline bench shape.

Usage: python benchmarks/validate_dense_walk.py
Appends to benchmarks/DENSE_RESULTS.json. TPU-only.
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
    T, BURNIN, compare, mlp_model, run_resident, run_scanned, xor_data,
)

from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense  # noqa: E402
from eeyore_tpu.ops.resident_walk import make_resident_mala, make_resident_mh  # noqa: E402
from eeyore_tpu.ops.resident_walk_dense import (  # noqa: E402
    make_resident_mala_dense,
    make_resident_mh_dense,
)
from eeyore_tpu.samplers import MALA, MetropolisHastings  # noqa: E402


def validate_walk():
    out = {}
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    xn, yn = np.asarray(x), np.asarray(y)

    dense_mh = run_resident(
        make_resident_mh_dense(model, xn, yn, scale=0.1, num_iters=T,
                               num_burnin_iters=BURNIN, chain_block=8192), model)
    scan_mh = run_scanned(MetropolisHastings(model, scale=0.1), (x, y))
    out["mh"] = compare("mh_mlp221_xor_dense_vs_scanned", dense_mh, scan_mh)

    dense_mala = run_resident(
        make_resident_mala_dense(model, xn, yn, step=0.1, num_iters=T,
                                 num_burnin_iters=BURNIN, chain_block=8192), model)
    scan_mala = run_scanned(MALA(model, step=0.1), (x, y))
    out["mala"] = compare("mala_mlp221_xor_dense_vs_scanned", dense_mala, scan_mala)
    return out


def bench_walk(num_chains=131072, num_iters=256, repeats=3):
    """Dense vs sublane resident walk throughput at the bench shape."""
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    xn, yn = np.asarray(x), np.asarray(y)
    out = {}
    makers = {
        "mh_dense": lambda: make_resident_mh_dense(
            model, xn, yn, scale=0.1, num_iters=num_iters, chain_block=8192),
        "mh_sublane": lambda: make_resident_mh(
            model, xn, yn, scale=0.1, num_iters=num_iters, chain_block=8192),
        "mala_dense": lambda: make_resident_mala_dense(
            model, xn, yn, step=0.1, num_iters=num_iters, chain_block=8192),
        "mala_sublane": lambda: make_resident_mala(
            model, xn, yn, step=0.1, num_iters=num_iters, chain_block=8192),
    }
    for name, maker in makers.items():
        fn = jax.jit(maker())
        theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                          (num_chains, model.num_params),
                                          dtype=jnp.float32)
        s, f, a = fn(7, theta0s)
        jax.block_until_ready((s, f, a))
        best = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            s, f, a = fn(7, theta0s)
            # block on ALL outputs: blocking only on `final` once recorded a
            # dispatch-latency artifact (411G "samples/s") at cb16384
            jax.block_until_ready((s, f, a))
            best = max(best, num_chains * num_iters / (time.perf_counter() - t0))
        out[name] = {"samples_per_s": round(best, 1),
                     "acceptance": round(float(np.asarray(a).mean()) / num_iters, 4)}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def bench_hmc_overhead(num_chains=131072, num_iters=256, repeats=3):
    """Dense HMC at the bench shape: raw (untransposed) outputs and a larger
    chain block, to locate the dispatch overhead vs the long-run rate."""
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    xn, yn = np.asarray(x), np.asarray(y)
    out = {}
    for name, kwargs in [
        ("raw_cb8192", dict(chain_block=8192, unstack_outputs=False)),
        ("raw_cb16384", dict(chain_block=16384, unstack_outputs=False)),
    ]:
        fn = jax.jit(make_resident_hmc_dense(
            model, xn, yn, step=0.05, num_steps=10, num_iters=num_iters,
            num_burnin_iters=0, **kwargs))
        theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                          (num_chains, model.num_params),
                                          dtype=jnp.float32)
        s, f, a = fn(7, theta0s)
        jax.block_until_ready((s, f, a))
        best = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            s, f, a = fn(7, theta0s)
            # block on ALL outputs: blocking only on `final` once recorded a
            # dispatch-latency artifact (411G "samples/s") at cb16384
            jax.block_until_ready((s, f, a))
            best = max(best, num_chains * num_iters / (time.perf_counter() - t0))
        acc = float(np.asarray(a).mean()) / num_iters
        assert 0.2 < acc <= 1.0
        out[name] = {"samples_per_s": round(best, 1), "acceptance": round(acc, 4)}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def main():
    path = Path(__file__).parent / "DENSE_RESULTS.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    results["walk_validation"] = validate_walk()
    results["walk_bench_131072x256"] = bench_walk()
    results["hmc_overhead_probes"] = bench_hmc_overhead()
    path.write_text(json.dumps(results, indent=2) + "\n")
    print("done")


if __name__ == "__main__":
    main()
