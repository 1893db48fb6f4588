"""Probe: how fast can the kernel->chain-major sample relayout go?

The dispatch layer's [kept, C, P] -> [C, kept, P] relayout costs 2.3-2.7x
on the dense NUTS path (597M raw vs 231-261M dispatched, round-4
DISPATCH_RESULTS.json). Both kernel families' HBM sample buffers are a free
reshape away from a single 2D transpose:

- dense:   [kept, P*8, lanes]  ==view==>  [kept*P, C]   (c = s*lanes + l)
- sublane: [kept, P, C]        ==view==>  [kept*P, C]   (after unpadding)

and [C, kept*P] ==view==> [C, kept, P] is the chain-major contract. So the
question is purely: XLA transpose vs a Pallas tiled transpose vs roofline
copy, at the headline shape (kept=1024, P=23, C=32768; 3.09 GB f32).

Also probes the derived-`accepted` pass: moved-vs-previous from chain-major
vs from the kernel-native layout (reduce over P then a small transpose).

Writes benchmarks/PROBE_RELAYOUT.json.
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_eeyore")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KEPT, P, C = 1024, 23, 32768
M = KEPT * P
GB = M * C * 4 / 1e9


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def make_pallas_t2d(tm, tn):
    def body(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    @jax.jit
    def t2d(a):
        m, n = a.shape
        return pl.pallas_call(
            body,
            grid=(m // tm, n // tn),
            in_specs=[pl.BlockSpec((tm, tn), lambda i, j: (i, j))],
            out_specs=pl.BlockSpec((tn, tm), lambda i, j: (j, i)),
            out_shape=jax.ShapeDtypeStruct((n, m), a.dtype),
        )(a)

    return t2d


def main():
    results = {"shape": [KEPT, P, C], "gb": round(GB, 3)}
    key = jax.random.PRNGKey(0)
    # kernel-native dense layout [kept, P*8, lanes]
    a3 = jax.random.normal(key, (KEPT, P * 8, C // 8), jnp.float32)
    a2 = a3.reshape(M, C)  # free view for the 2D formulations

    copy = jax.jit(lambda x: x + 1.0)
    t = timeit(copy, a2)
    results["copy_roundtrip"] = {"s": t, "gbps": 2 * GB / t}
    print("copy (read+write roofline anchor):", results["copy_roundtrip"])

    xla3 = jax.jit(lambda x: jnp.transpose(
        x.reshape(KEPT, P, C), (2, 0, 1)))
    t = timeit(xla3, a3)
    results["xla_3d"] = {"s": t, "gbps": 2 * GB / t}
    print("xla 3d permute (t,p,c)->(c,t,p):", results["xla_3d"])

    xla2 = jax.jit(lambda x: x.T.reshape(C, KEPT, P))
    t = timeit(xla2, a2)
    results["xla_2d"] = {"s": t, "gbps": 2 * GB / t}
    print("xla 2d transpose:", results["xla_2d"])

    for tm, tn in [(256, 256), (512, 512), (1024, 256), (256, 1024),
                   (736, 512), (1472, 256)]:
        if M % tm or C % tn:
            continue
        try:
            fn = make_pallas_t2d(tm, tn)
            t = timeit(fn, a2)
            ok = bool(jnp.array_equal(fn(a2)[:8, :8], a2[:8, :8].T))
            results[f"pallas_{tm}x{tn}"] = {"s": t, "gbps": 2 * GB / t,
                                            "ok": ok}
            print(f"pallas {tm}x{tn}:", results[f"pallas_{tm}x{tn}"])
        except Exception as e:  # Mosaic may reject the in-kernel .T
            results[f"pallas_{tm}x{tn}"] = {"error": str(e)[:200]}
            print(f"pallas {tm}x{tn}: FAILED {str(e)[:200]}")

    # accepted-derivation variants
    cm = xla2(a2)  # [C, kept, P] chain-major
    jax.block_until_ready(cm)

    acc_cm = jax.jit(lambda s: jnp.any(s[:, 1:, :] != s[:, :-1, :], axis=-1))
    t = timeit(acc_cm, cm)
    results["accepted_from_chainmajor"] = {"s": t}
    print("accepted from chain-major:", results["accepted_from_chainmajor"])

    acc_kn = jax.jit(lambda x: jnp.any(
        x.reshape(KEPT, P, C)[1:] != x.reshape(KEPT, P, C)[:-1],
        axis=1).T)
    t = timeit(acc_kn, a2)
    results["accepted_from_kernel_native"] = {"s": t}
    print("accepted from kernel-native:", results["accepted_from_kernel_native"])

    # fused: one jit doing transpose + accepted from the same input
    def fused(x):
        s = x.T.reshape(C, KEPT, P)
        mov = jnp.any(x.reshape(KEPT, P, C)[1:] != x.reshape(KEPT, P, C)[:-1],
                      axis=1).T
        return s, mov

    t = timeit(jax.jit(fused), a2)
    results["xla2d_plus_accept_fused"] = {"s": t}
    print("xla 2d + accepted fused:", results["xla2d_plus_accept_fused"])

    with open(os.path.join(os.path.dirname(__file__),
                           "PROBE_RELAYOUT.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("saved PROBE_RELAYOUT.json")


if __name__ == "__main__":
    main()
