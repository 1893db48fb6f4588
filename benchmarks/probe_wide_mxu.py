"""Wide-fan-in MXU validation: where the layer-0 selector-matmul path WINS.

On iris (fan-in 4) the MXU path loses to the VPU schedule (K pads 27->128:
79% padding waste, PROBE_IRIS_MXU.json). This probes a wider model —
MLP(64, 8, 2) on synthetic 128-row data (P=594 parameters) — where layer 0
is 64x8 = 512 fmas per chunk on the VPU but mostly-real work on the MXU.
Runs the streamed resident HMC kernel with mxu_layer0 off/on and checks
acceptance parity. Writes benchmarks/PROBE_WIDE_MXU.json. TPU-only.
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
from eeyore_tpu.ops.resident_hmc import make_resident_hmc

C = 4096
T = 512
BURNIN = 256

OUT = Path(__file__).parent / "PROBE_WIDE_MXU.json"


def wide_model_data():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((128, 64)).astype(np.float32)
    w_true = rng.standard_normal((64,)) / 8.0
    logits = x @ w_true
    y = np.zeros((128, 2), np.float32)
    y[np.arange(128), (logits > 0).astype(int)] = 1.0
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[64, 8, 2],
                                            activations=[jax.nn.sigmoid, None]),
                dtype=jnp.float32)
    return model, x, y


def time_fn(make_fn, P):
    fn = jax.jit(make_fn)
    theta0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (C, P), jnp.float32)
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
    return {"samples_per_s": round(C * T / best, 1),
            "acceptance": round(float(np.asarray(a).mean()) / (T - BURNIN), 4),
            "compile_plus_first_s": round(compile_s, 1)}


def main():
    model, x, y = wide_model_data()
    P = model.num_params
    results = {"P": P}
    for name, mxu in (("vpu", False), ("mxu", True)):
        res = time_fn(make_resident_hmc(
            model, x, y, step=0.005, num_steps=4, num_iters=T,
            num_burnin_iters=BURNIN, chain_block=128, stream=True,
            mxu_layer0=mxu, vmem_limit_bytes=96 * 1024 * 1024), P)
        results[name] = res
        print(json.dumps({name: res}), flush=True)
    results["mxu_speedup"] = round(
        results["mxu"]["samples_per_s"] / results["vpu"]["samples_per_s"], 2)
    results["acceptance_match"] = bool(
        abs(results["mxu"]["acceptance"] - results["vpu"]["acceptance"]) < 0.03)
    print(json.dumps({"mxu_speedup": results["mxu_speedup"],
                      "acceptance_match": results["acceptance_match"]}))
    OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
