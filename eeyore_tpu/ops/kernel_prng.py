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


def sincos_2pi(u):
    """(cos(2 pi u), sin(2 pi u)) for u in (0, 1] via quadrant reduction +
    degree-10/9 Taylor polynomials in w = (pi/2) * frac(4u).

    A uniform input makes the range reduction FREE (quadrant = floor(4u),
    no fmod of an arbitrary angle), so the pair costs ~25 cheap VPU ops
    instead of two transcendental calls — which were measured at 39% / 32%
    of the dense MH / MALA kernels' total wall (benchmarks/PROBE_PRNG.json).
    Max abs error ~3e-7 (f32 round-off scale; tests/test_ops.py pins it).
    """
    v = 4.0 * u
    q = jnp.floor(v)
    t = v - q
    qi = q.astype(jnp.int32)
    z = t * t
    a = (math.pi / 2.0) ** 2
    # cos(w) and sin(w)/w Taylor series with the (pi/2)^2 scale folded in
    c = 1.0 + z * (-a / 2.0 + z * (a * a / 24.0 + z * (
        -a**3 / 720.0 + z * (a**4 / 40320.0 + z * (
            -a**5 / 3628800.0 + z * (a**6 / 479001600.0))))))
    s = (t * (math.pi / 2.0)) * (1.0 + z * (-a / 6.0 + z * (
        a * a / 120.0 + z * (-a**3 / 5040.0 + z * (
            a**4 / 362880.0 + z * (-a**5 / 39916800.0))))))
    odd = (qi & 1) == 1
    base_c = jnp.where(odd, s, c)
    base_s = jnp.where(odd, c, s)
    qm = qi & 3  # u == 1 gives q = 4: same as quadrant 0 with t = 0
    neg_c = jnp.logical_or(qm == 1, qm == 2)
    neg_s = qm >= 2
    return (jnp.where(neg_c, -base_c, base_c),
            jnp.where(neg_s, -base_s, base_s))


def normal(shape):
    """Standard normals via Box-Muller, using BOTH halves of each transform.

    (r cos a, r sin a) from one (u1, u2) pair are two independent N(0,1)
    draws, so a [rows, cols] request only needs ceil(rows/2) uniform rows —
    half the log/sqrt/cos+sin traffic of the one-sided form (which dominates
    per-iteration fixed costs in the small-model resident kernels,
    docs/PERF_NOTES.md). The angle pair comes from the polynomial
    ``sincos_2pi`` rather than transcendental cos/sin."""
    rows, cols = shape
    if rows <= 8:
        # a single (8, 128) f32 tile either way — pairing saves nothing and
        # the concatenate would add a copy
        u1 = uniform(shape)
        u2 = uniform(shape)
        cos, _ = sincos_2pi(u2)
        return jnp.sqrt(-2.0 * jnp.log(u1)) * cos
    # round the half up to a sublane-tile multiple so the concatenate seam
    # sits on an (8, 128) boundary (an unaligned seam costs retile shuffles
    # that can eat the transcendental savings)
    half = ((rows + 1) // 2 + 7) // 8 * 8
    u1 = uniform((half, cols))
    u2 = uniform((half, cols))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    cos, sin = sincos_2pi(u2)
    z = jnp.concatenate([r * cos, r * sin], axis=0)
    return z[:rows, :]


def normal_tiles(count, shape):
    """``count`` independent N(0,1) tiles of ``shape`` — the dense chain-tile
    layout's draw (one tile per model parameter). ceil(count/2) Box-Muller
    pairs with polynomial sincos; an odd trailing tile wastes only the sin
    half's two final ops."""
    tiles = []
    for pair in range((count + 1) // 2):
        u1 = uniform(shape)
        u2 = uniform(shape)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        cos, sin = sincos_2pi(u2)
        tiles.append(r * cos)
        if 2 * pair + 1 < count:
            tiles.append(r * sin)
    return tiles
