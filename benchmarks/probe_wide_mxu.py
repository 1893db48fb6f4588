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


def wide_model_data(fan_in=64):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((128, fan_in)).astype(np.float32)
    w_true = rng.standard_normal((fan_in,)) / 8.0
    logits = x @ w_true
    y = np.zeros((128, 2), np.float32)
    y[np.arange(128), (logits > 0).astype(int)] = 1.0
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[fan_in, 8, 2],
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


def probe_fan_in(fan_in, variants=(("vpu", False, "highest"),
                                   ("mxu_highest", True, "highest"),
                                   ("mxu_bf16_3pass", True, "bf16_3pass"))):
    model, x, y = wide_model_data(fan_in)
    P = model.num_params
    results = {"P": P}
    for name, mxu, prec in variants:
        res = time_fn(make_resident_hmc(
            model, x, y, step=0.005, num_steps=4, num_iters=T,
            num_burnin_iters=BURNIN, chain_block=128, stream=True,
            mxu_layer0=mxu, matmul_precision=prec,
            vmem_limit_bytes=96 * 1024 * 1024), P)
        results[name] = res
        print(json.dumps({f"fan{fan_in}_{name}": res}), flush=True)
    for name in [v[0] for v in variants[1:]]:
        results[f"{name}_speedup"] = round(
            results[name]["samples_per_s"] / results["vpu"]["samples_per_s"], 2)
        results[f"{name}_acceptance_match"] = bool(
            abs(results[name]["acceptance"]
                - results["vpu"]["acceptance"]) < 0.03)
    return results


def main():
    # --fan-ins 32,48,64 sweeps the bf16_3pass crossover (round-4 lever 5:
    # the hi/lo 3-pass split halves the MXU-side cost, so the VPU/MXU
    # break-even should drop from the measured 64 toward ~32)
    fan_ins = (64,)
    for arg in sys.argv[1:]:
        if arg.startswith("--fan-ins="):
            fan_ins = tuple(int(v) for v in arg.split("=", 1)[1].split(","))
    existing = json.loads(OUT.read_text()) if OUT.exists() else {}
    for fan_in in fan_ins:
        existing[f"fan_in_{fan_in}"] = probe_fan_in(fan_in)
    OUT.write_text(json.dumps(existing, indent=2))
    print(json.dumps({k: {n: v[n + "_speedup"] for n in
                          ("mxu_highest", "mxu_bf16_3pass")
                          if n + "_speedup" in v}
                      for k, v in existing.items() if k.startswith("fan_in")}))


if __name__ == "__main__":
    main()
