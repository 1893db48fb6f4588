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
    """Standard normals via Box-Muller."""
    u1 = uniform(shape)
    u2 = uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * math.pi * u2)
