"""Bottleneck probes for the iris-scale resident HMC kernel (VERDICT item 1).

The north-star config-3 workload (HMC, MLP(4,3,3), iris) runs at ~10.8M
samples/s on the data-on-sublanes resident kernel vs 483M for dense XOR.
Before redesigning, measure WHERE the time goes:

  ns1/ns8/ns32   — vary leapfrog trajectory length: per-iteration time
                   t = fixed + ns * leapfrog tells us the fixed overhead
                   (PRNG momentum draw, accept, DMA) vs per-gradient cost.
  cb512          — halve the chain block: if throughput holds, the kernel is
                   compute-bound; if it jumps, VMEM pressure (spills) at 1024.
  cheap_sigmoid  — monkeypatch sigmoid with a 2-op rational: the difference
                   bounds the transcendental (EUP) share of the leapfrog.
  mh_valueonly   — resident random-walk MH on the same model/data: the
                   forward-only cost (no backward pass, 1 eval/iter).

Writes benchmarks/PROBE_IRIS.json. TPU-only.
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

from eeyore_tpu.datasets import XYDataset
from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.ops.resident_hmc import make_resident_hmc
from eeyore_tpu.ops.resident_walk import make_resident_mh

DT = jnp.float32
C = 32768
T = 2048
BURNIN = 1024

OUT = Path(__file__).parent / "PROBE_IRIS.json"


def iris_model_data():
    ds = XYDataset.from_eeyore("iris", yonehot=True)
    x, y = np.asarray(ds.x, np.float32), np.asarray(ds.y, np.float32)
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3], activations=[jax.nn.sigmoid, None]),
                dtype=DT)
    return model, x, y


def time_fn(make_fn, num_chains=C, num_iters=T):
    fn = jax.jit(make_fn)
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (num_chains, 27), dtype=DT)
    t0 = time.perf_counter()
    samples, final, acc = fn(7, theta0s)
    jax.block_until_ready(final)
    compile_and_run = time.perf_counter() - t0
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        samples, final, acc = fn(7, theta0s)
        jax.block_until_ready(final)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return {
        "samples_per_s": num_chains * num_iters / best,
        "elapsed_s": best,
        "per_iter_us": best / num_iters * 1e6,
        "compile_plus_first_s": compile_and_run,
    }


def main():
    model, x, y = iris_model_data()
    results = {}

    def hmc_probe(name, num_steps, chain_block=1024, record_thin=1):
        res = time_fn(make_resident_hmc(
            model, x, y, step=0.02, num_steps=num_steps, num_iters=T,
            num_burnin_iters=BURNIN, chain_block=chain_block,
            record_thin=record_thin))
        res["num_steps"] = num_steps
        res["chain_block"] = chain_block
        results[name] = res
        print(json.dumps({name: res}), flush=True)

    hmc_probe("ns8_cb1024", 8)          # baseline (validate_resident config)
    hmc_probe("ns1_cb1024", 1)
    hmc_probe("ns32_cb1024", 32)
    hmc_probe("ns8_cb512", 8, chain_block=512)
    hmc_probe("ns8_cb1024_thin64", 8, record_thin=64)  # DMA share

    # transcendental share: sigmoid -> cheap rational (math is wrong on
    # purpose; timing only)
    real_sigmoid = jax.nn.sigmoid
    try:
        jax.nn.sigmoid = lambda z: 0.5 + z / (2.0 + 2.0 * jnp.abs(z))
        hmc_probe("ns8_cheap_sigmoid", 8)
    finally:
        jax.nn.sigmoid = real_sigmoid

    # forward-only cost: resident MH on the same model/data
    res = time_fn(make_resident_mh(model, x, y, scale=0.02, num_iters=T,
                                   num_burnin_iters=BURNIN, chain_block=1024))
    results["mh_valueonly_cb1024"] = res
    print(json.dumps({"mh_valueonly_cb1024": res}), flush=True)

    # derived: per-leapfrog cost and fixed overhead from ns1 vs ns8 vs ns32
    t1 = results["ns1_cb1024"]["per_iter_us"]
    t8 = results["ns8_cb1024"]["per_iter_us"]
    t32 = results["ns32_cb1024"]["per_iter_us"]
    lf = (t32 - t1) / 31.0
    results["derived"] = {
        "leapfrog_us_per_iter": lf,
        "fixed_us_per_iter": t1 - lf,
        "ns8_predicted_us": t1 + 7 * lf,
        "ns8_actual_us": t8,
    }
    print(json.dumps({"derived": results["derived"]}), flush=True)

    OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
