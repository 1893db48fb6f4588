"""Throughput probe for the row-streaming vg schedule on the iris resident
HMC kernel (follow-up to probe_iris_hmc.py, VERDICT item 1).

The baseline schedule spills VMEM at chain_block 1024 (cb512 runs faster);
the streaming schedule's live set is O(P) tiles, so larger chain blocks
should now scale. Also probes resident MH (value-only forward) with
streaming. Writes benchmarks/PROBE_IRIS_STREAM.json. TPU-only.
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

OUT = Path(__file__).parent / "PROBE_IRIS_STREAM.json"


def iris_model_data():
    ds = XYDataset.from_eeyore("iris", yonehot=True)
    x, y = np.asarray(ds.x, np.float32), np.asarray(ds.y, np.float32)
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3], activations=[jax.nn.sigmoid, None]),
                dtype=DT)
    return model, x, y


def time_fn(make_fn, num_chains=C, num_iters=T, check=True):
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
    out = {
        "samples_per_s": num_chains * num_iters / best,
        "elapsed_s": best,
        "per_iter_us": best / num_iters * 1e6,
        "compile_plus_first_s": compile_and_run,
    }
    if check:
        out["acceptance"] = float(np.asarray(acc).mean()) / (num_iters - BURNIN)
        out["finite"] = bool(np.isfinite(np.asarray(samples[-1])).all())
    return out


def main():
    model, x, y = iris_model_data()
    results = {}

    def hmc_probe(name, chain_block, stream=True):
        res = time_fn(make_resident_hmc(
            model, x, y, step=0.02, num_steps=8, num_iters=T,
            num_burnin_iters=BURNIN, chain_block=chain_block, stream=stream))
        res["chain_block"] = chain_block
        res["stream"] = stream
        results[name] = res
        print(json.dumps({name: res}), flush=True)

    hmc_probe("stream_cb512", 512)
    hmc_probe("stream_cb1024", 1024)
    hmc_probe("stream_cb2048", 2048)
    hmc_probe("stream_cb4096", 4096)

    res = time_fn(make_resident_mh(model, x, y, scale=0.02, num_iters=T,
                                   num_burnin_iters=BURNIN, chain_block=2048,
                                   stream=True))
    results["mh_stream_cb2048"] = res
    print(json.dumps({"mh_stream_cb2048": res}), flush=True)

    OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
