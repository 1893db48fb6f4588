"""On-core PRNG helpers for the VMEM-resident Pallas kernels.

Wraps pltpu.prng_random_bits into (0,1] uniforms (mantissa-fill trick) and
standard normals (Box-Muller). Streams are statistically equivalent to
jax.random but not bit-matched — posterior-moment tests on device validate
the samplers built on these (benchmarks/validate_resident.py).
"""

import math

import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu


def uniform(shape):
    """(0, 1] uniforms from raw PRNG bits."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
    return 1.0 - f  # (0, 1]


def normal(shape):
    """Standard normals via Box-Muller, using BOTH halves of each transform.

    (r cos a, r sin a) from one (u1, u2) pair are two independent N(0,1)
    draws, so a [rows, cols] request only needs ceil(rows/2) uniform rows —
    half the log/sqrt/cos+sin transcendental traffic of the one-sided form
    (which dominates per-iteration fixed costs in the small-model resident
    kernels, docs/PERF_NOTES.md)."""
    rows, cols = shape
    if rows <= 8:
        # a single (8, 128) f32 tile either way — pairing saves nothing and
        # the concatenate would add a copy
        u1 = uniform(shape)
        u2 = uniform(shape)
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * math.pi * u2)
    # round the half up to a sublane-tile multiple so the concatenate seam
    # sits on an (8, 128) boundary (an unaligned seam costs retile shuffles
    # that can eat the transcendental savings)
    half = ((rows + 1) // 2 + 7) // 8 * 8
    u1 = uniform((half, cols))
    u2 = uniform((half, cols))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = 2.0 * math.pi * u2
    z = jnp.concatenate([r * jnp.cos(a), r * jnp.sin(a)], axis=0)
    return z[:rows, :]


def normal_tiles(count, shape):
    """``count`` independent N(0,1) tiles of ``shape`` — the dense chain-tile
    layout's draw (one tile per model parameter). ceil(count/2) Box-Muller
    pairs; an odd trailing tile computes only the cos half (no wasted sin)."""
    tiles = []
    for pair in range((count + 1) // 2):
        u1 = uniform(shape)
        u2 = uniform(shape)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        a = (2.0 * math.pi) * u2
        tiles.append(r * jnp.cos(a))
        if 2 * pair + 1 < count:
            tiles.append(r * jnp.sin(a))
    return tiles
