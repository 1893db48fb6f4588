"""Third iris probe round: MXU layer-0 hybrid (Z0/G0 matmul panels) on the
row-streaming resident HMC kernel, at both matmul precisions. Writes
benchmarks/PROBE_IRIS_MXU.json. TPU-only."""

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

DT = jnp.float32
C = 32768
T = 2048
BURNIN = 1024

OUT = Path(__file__).parent / "PROBE_IRIS_MXU.json"


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
        "compile_plus_first_s": compile_and_run,
        "acceptance": float(np.asarray(acc).mean()) / (num_iters - BURNIN),
        "finite": bool(np.isfinite(np.asarray(samples[-1])).all()),
    }


def main():
    model, x, y = iris_model_data()
    results = {}

    def probe(name, chain_block, precision="high"):
        try:
            res = time_fn(make_resident_hmc(
                model, x, y, step=0.02, num_steps=8, num_iters=T,
                num_burnin_iters=BURNIN, chain_block=chain_block, stream=True,
                mxu_layer0=True, matmul_precision=precision))
        except Exception as err:
            res = {"error": f"{type(err).__name__}: {str(err)[:300]}"}
        res["chain_block"] = chain_block
        res["precision"] = precision
        results[name] = res
        print(json.dumps({name: res}), flush=True)

    probe("mxu_cb256_highest", 256, precision="highest")
    probe("mxu_cb512_highest", 512, precision="highest")
    probe("mxu_cb1024_highest", 1024, precision="highest")
    # single-pass bf16: rounds matmul inputs to 8 mantissa bits — timing
    # reference only unless acceptance/moments validate
    probe("mxu_cb256_bf16", 256, precision="default")

    OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
