"""End-to-end relayout probe: dense NUTS kernel + candidate chain-major
relayouts, timed the same way validate_dense_nuts.py timed the 597M raw /
261M dispatched gap (block on all jit outputs; the whole program completes
together).

Variants (all one jit around the same maker):
  raw         — unstack_outputs=True, [kept, C, P] (round-4 "597M" contract)
  dispatch_r4 — raw + swapaxes(0,1) -> [C, kept, P] (round-4 dispatch, ~261M)
  xla2d       — unstack_outputs=False, free-reshape [kept*P, C], XLA .T,
                free-reshape [C, kept, P]
  pallas_TxN  — same but the transpose is a tiled Pallas kernel
                (out tile [tn, tm] = in tile [tm, tn].T)
  +accept     — winner + derived accepted flags (from kernel-native layout)

Writes benchmarks/PROBE_RELAYOUT2.json.
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

from jax.experimental import pallas as pl  # noqa: E402

from validate_resident import mlp_model, xor_data  # noqa: E402

from eeyore_tpu.ops.resident_nuts_dense import make_resident_nuts_dense  # noqa: E402
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

C = 32768
T = 2048
BURNIN = 1024
KEPT = T - BURNIN
STEP = 0.1
MAX_DEPTH = 3
REPEATS = 4

OUT_PATH = Path(__file__).parent / "PROBE_RELAYOUT2.json"


def pallas_t2d(a, tm, tn):
    m, n = a.shape

    def body(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    return pl.pallas_call(
        body,
        grid=(m // tm, n // tn),
        in_specs=[pl.BlockSpec((tm, tn), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((n, m), a.dtype),
    )(a)


def main():
    model = mlp_model([2, 2, 1])
    P = model.num_params
    x, y = xor_data()
    rows = P * 8
    lanes = C // 8
    M = KEPT * P

    base_raw = make_resident_nuts_dense(
        model, np.asarray(x), np.asarray(y), step=STEP, max_depth=MAX_DEPTH,
        num_iters=T, num_burnin_iters=BURNIN, chain_block=8192,
        tuner=HMCDATuner(d=0.8))

    def native(seed, th):
        return base_raw(seed, th, unstack_outputs=False)

    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (C, P),
                                      dtype=jnp.float32)

    variants = {}
    variants["raw"] = jax.jit(lambda s, th: base_raw(s, th))
    variants["dispatch_r4"] = jax.jit(
        lambda s, th: (lambda o: (jnp.swapaxes(o[0], 0, 1),) + o[1:])(
            base_raw(s, th)))

    def with_relayout(tr):
        def fn(s, th):
            samples, final, acc, div = native(s, th)
            cm = tr(samples.reshape(M, C)).reshape(C, KEPT, P)
            return cm, final, acc, div
        return jax.jit(fn)

    variants["xla2d"] = with_relayout(lambda a: a.T)
    for tm, tn in [(256, 256), (256, 512), (512, 256), (128, 512),
                   (512, 1024), (1024, 512)]:
        if M % tm == 0 and C % tn == 0:
            variants[f"pallas_{tm}x{tn}"] = with_relayout(
                lambda a, tm=tm, tn=tn: pallas_t2d(a, tm, tn))

    def accept_native(s, th):
        samples, final, acc, div = native(s, th)
        k = samples.reshape(KEPT, P, C)
        cm = pallas_t2d(samples.reshape(M, C), 256, 512).reshape(C, KEPT, P)
        moved = jnp.any(k[1:] != k[:-1], axis=1)          # [KEPT-1, C]
        accepted = pallas_t2d(
            jnp.concatenate([jnp.ones((1, C), jnp.float32),
                             moved.astype(jnp.float32)]), 256, 512)
        return cm, accepted, final, acc, div

    variants["pallas_256x512_acc"] = jax.jit(accept_native)

    def accept_cm(s, th):
        samples, final, acc, div = native(s, th)
        cm = pallas_t2d(samples.reshape(M, C), 256, 512).reshape(C, KEPT, P)
        moved = jnp.any(cm[:, 1:, :] != cm[:, :-1, :], axis=-1)
        accepted = jnp.concatenate(
            [jnp.ones((C, 1), jnp.bool_), moved], axis=1)
        return cm, accepted, final, acc, div

    variants["pallas_256x512_acc_cm"] = jax.jit(accept_cm)

    results = {"config": {"C": C, "kept": KEPT, "P": P, "depth": MAX_DEPTH}}
    total = C * KEPT
    for name, fn in variants.items():
        try:
            out = fn(7, theta0s)
            jax.block_until_ready(out)
            best = None
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                out = fn(7, theta0s)
                jax.block_until_ready(out)
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            # sanity: chain-major variants must match raw's transposed slice
            results[name] = {"s": round(best, 5),
                             "samples_per_s": round(total / best / 1e6, 1)}
            print(name, results[name], flush=True)
            del out
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            print(name, "FAILED", str(e)[:300], flush=True)

    # correctness: pallas relayout == swapaxes of raw
    raw = variants["raw"](7, theta0s)[0]
    cm = variants["pallas_256x512"](7, theta0s)[0]
    ok = bool(jnp.array_equal(jnp.swapaxes(raw[:, :64, :], 0, 1),
                              cm[:64]))
    results["pallas_matches_raw"] = ok
    print("pallas relayout matches raw:", ok)

    OUT_PATH.write_text(json.dumps(results, indent=2))
    print("saved", OUT_PATH)


if __name__ == "__main__":
    main()
