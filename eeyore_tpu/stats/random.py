"""Index-sampling helpers (DEMC partner selection).

Reference: /root/reference/eeyore/stats/random.py:5-13 — uniform index with
exclusion. The jit-friendly variant here draws from the reduced range and
shifts past excluded indices, instead of rejection-looping in Python.
"""

import jax
import jax.numpy as jnp


def choose(key, n):
    """Uniform index in [0, n)."""
    return jax.random.randint(key, (), 0, n)


def choose_from_subset(key, n, exclude):
    """Uniform index in [0, n) excluding the sorted static list ``exclude``.

    Draws uniformly from n - len(exclude) slots and shifts over the excluded
    values — exact (no rejection loop), jittable.
    """
    exclude = sorted(exclude)
    idx = jax.random.randint(key, (), 0, n - len(exclude))
    for e in exclude:
        idx = jnp.where(idx >= e, idx + 1, idx)
    return idx
