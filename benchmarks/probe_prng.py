"""PRNG-cost probes for the dense walk kernels (VERDICT item 3 scoping).

The round-2 notes flag the MH/MALA dense kernels as PRNG-bound (Box-Muller
log/sqrt/cos/sin). Before building an inverse-CDF normal, measure the
actual PRNG share by swapping ``normal_tiles`` for statistically-wrong but
structurally-similar cheap variants (timing only):

  baseline       — Box-Muller (current)
  fake_sum       — z = u1 + u2 - 1 (two raw uniforms, zero transcendentals):
                   lower bound on any PRNG that consumes 2 uniforms/tile
  no_sincos      — r * (2 u2 - 1) instead of r cos/sin: isolates the
                   sincos share vs the log/sqrt share

Writes benchmarks/PROBE_PRNG.json. TPU-only.
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
from eeyore_tpu.ops import resident_walk_dense as rwd
from eeyore_tpu.ops.kernel_prng import uniform as _uniform

C = 131072
T = 2048

OUT = Path(__file__).parent / "PROBE_PRNG.json"


def model_xy():
    x = np.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], np.float32)
    y = np.asarray([[0.], [1.], [1.], [0.]], np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    return model, x, y


def fake_sum_tiles(count, shape):
    return [_uniform(shape) + _uniform(shape) - 1.0 for _ in range(count)]


def no_sincos_tiles(count, shape):
    tiles = []
    for pair in range((count + 1) // 2):
        u1 = _uniform(shape)
        u2 = _uniform(shape)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        tiles.append(r * (2.0 * u2 - 1.0))
        if 2 * pair + 1 < count:
            tiles.append(r * (1.0 - 2.0 * u2))
    return tiles


def time_kernel(make):
    fn = jax.jit(make)
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (C, 9), jnp.float32)
    s, f, a = fn(7, theta0s)
    jax.block_until_ready(f)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        s, f, a = fn(7, theta0s)
        jax.block_until_ready(f)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return C * T / best


def main():
    model, x, y = model_xy()
    results = {}
    real = rwd.normal_tiles
    variants = [("baseline", real), ("fake_sum", fake_sum_tiles),
                ("no_sincos", no_sincos_tiles)]
    for name, tiles_fn in variants:
        rwd.normal_tiles = tiles_fn
        try:
            for kern, maker in (("mh", rwd.make_resident_mh_dense),
                                ("mala", rwd.make_resident_mala_dense)):
                # record_thin keeps the samples output at ~300MB (2048
                # full-record iters x 131072 chains would be 9.7GB: OOM)
                kwargs = dict(num_iters=T, num_burnin_iters=0, chain_block=8192,
                              record_thin=32)
                if kern == "mh":
                    fn = maker(model, x, y, scale=0.1, **kwargs)
                else:
                    fn = maker(model, x, y, step=0.01, **kwargs)
                sps = time_kernel(fn)
                results[f"{kern}_{name}"] = round(sps, 1)
                print(json.dumps({f"{kern}_{name}": results[f"{kern}_{name}"]}),
                      flush=True)
        finally:
            rwd.normal_tiles = real

    for kern in ("mh", "mala"):
        base = results[f"{kern}_baseline"]
        results[f"{kern}_prng_share"] = round(
            1.0 - base / results[f"{kern}_fake_sum"], 3)
        results[f"{kern}_sincos_share"] = round(
            1.0 - base / results[f"{kern}_no_sincos"], 3)
    print(json.dumps({k: v for k, v in results.items() if "share" in k}))
    OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
