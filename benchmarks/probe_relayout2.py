"""End-to-end dispatch-overhead probe (round 5).

Round 4 recorded a 597M-raw vs 231-261M-dispatched NUTS gap. Re-measured
apples-to-apples (same elapsed-time denominator and SAME accounting:
C * num_iters / s, the convention of validate_dense_nuts/summarize), the
fused [kept,C,P]->[C,kept,P] transpose costs ~1%: the round-4 gap was
mostly ACCOUNTING (the raw 597M counted all 2048 iterations including
burn-in; the ad-hoc dispatch numbers counted the 1024 kept samples), plus
the derived-accepted pass and dispatch-layer overheads. This probe
decomposes what is actually left between the raw maker and the public
``sample_chains(backend=...)`` path:

  raw           — jit(maker), [kept, C, P] outputs (the 597M-convention anchor)
  raw_t         — + fused swapaxes -> [C, kept, P] (what run_kernel_backend jits)
  raw_t_acc_kn  — + accepted derived from the KERNEL-NATIVE layout
  raw_t_acc_cm  — + accepted derived from the chain-major output (round-4 way)
  api_samples   — sample_chains(..., record_keys=("sample",), return_arrays=True)
  api_accepted  — sample_chains(..., record_keys=("sample","accepted"), ...)

Writes benchmarks/PROBE_RELAYOUT2.json. TPU.
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

from eeyore_tpu.ops.resident_nuts_dense import make_resident_nuts_dense  # noqa: E402
from eeyore_tpu.samplers import NUTS, sample_chains  # noqa: E402
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

C = 32768
T = 2048
BURNIN = 1024
KEPT = T - BURNIN
STEP = 0.1
MAX_DEPTH = 3
REPEATS = 6

OUT_PATH = Path(__file__).parent / "PROBE_RELAYOUT2.json"


def bench(fn, *args, reps=REPEATS):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    del out
    return best


def main():
    model = mlp_model([2, 2, 1])
    P = model.num_params
    x, y = xor_data()

    base = make_resident_nuts_dense(
        model, np.asarray(x), np.asarray(y), step=STEP, max_depth=MAX_DEPTH,
        num_iters=T, num_burnin_iters=BURNIN, chain_block=8192,
        tuner=HMCDATuner(d=0.8))
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (C, P),
                                      dtype=jnp.float32)

    results = {"config": {"C": C, "iters": T, "kept": KEPT, "P": P,
                          "depth": MAX_DEPTH},
               "note": ("samples_per_s uses C*iters/s — the "
                        "validate_dense_nuts summarize() convention the "
                        "597M round-4 number used")}

    def report(name, secs):
        results[name] = {"s": round(secs, 5),
                         "samples_per_s": round(C * T / secs / 1e6, 1),
                         "kept_per_s": round(C * KEPT / secs / 1e6, 1)}
        print(name, results[name], flush=True)

    report("raw", bench(jax.jit(lambda s, th: base(s, th)), 7, theta0s))
    report("raw_t", bench(jax.jit(
        lambda s, th: (lambda o: (jnp.swapaxes(o[0], 0, 1),) + o[1:])(
            base(s, th))), 7, theta0s))

    base_native = make_resident_nuts_dense(
        model, np.asarray(x), np.asarray(y), step=STEP, max_depth=MAX_DEPTH,
        num_iters=T, num_burnin_iters=BURNIN, chain_block=8192,
        tuner=HMCDATuner(d=0.8), unstack_outputs=False)

    def t_acc_kn(s, th):
        samples, final, acc, div = base_native(s, th)
        # kernel-native [kept, P*8, lanes]: free view [kept, P, C]
        kn = samples.reshape(KEPT, P, C)
        cm = samples.reshape(KEPT * P, C).T.reshape(C, KEPT, P)
        moved = jnp.any(kn[1:] != kn[:-1], axis=1)        # [KEPT-1, C]
        accepted = jnp.concatenate(
            [jnp.ones((1, C), jnp.bool_), moved]).T       # [C, KEPT]
        return cm, accepted, final, acc, div

    report("raw_t_acc_kn", bench(jax.jit(t_acc_kn), 7, theta0s))

    def t_acc_cm(s, th):
        samples, final, acc, div = base(s, th)
        cm = jnp.swapaxes(samples, 0, 1)
        moved = jnp.any(cm[:, 1:, :] != cm[:, :-1, :], axis=-1)
        accepted = jnp.concatenate([jnp.ones((C, 1), jnp.bool_), moved],
                                   axis=1)
        return cm, accepted, final, acc, div

    report("raw_t_acc_cm", bench(jax.jit(t_acc_cm), 7, theta0s))

    kernel = NUTS(model, step=STEP, max_depth=MAX_DEPTH, fixed_budget=True,
                  tuner=HMCDATuner(d=0.8))
    key = jax.random.PRNGKey(0)

    def api(record_keys):
        return sample_chains(kernel, key, theta0s, (x, y), T, BURNIN,
                             record_keys=record_keys, return_arrays=True,
                             backend="dense")

    report("api_samples", bench(lambda: api(("sample",))))
    report("api_accepted", bench(lambda: api(("sample", "accepted"))))

    OUT_PATH.write_text(json.dumps(results, indent=2))
    print("saved", OUT_PATH)


if __name__ == "__main__":
    main()
