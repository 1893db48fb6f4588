"""Dual-averaging step-size adaptation (Hoffman & Gelman 2014, Algs 4-5).

Reference: /root/reference/eeyore/tuners/hmcda_tuner.py:8-59 — targets
acceptance d=0.65 with g=0.05, t0=10, k=0.75, m = log(10 e0), and a
non-standard optional step upper bound ``eub``. Here the tuner is a pure
state pytree updated inside the jitted sampling scan (it lives in the HMC
kernel's carry instead of mutating a Python object per iteration).
"""

import math

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    m: jax.Array        # log(10 * e0)
    barh: jax.Array     # running (d - rate) average
    logbare: jax.Array  # averaged log step
    loge: jax.Array     # last instantaneous log step


class HMCDATuner:
    """Static tuner config; ``init``/``tune`` are pure."""

    def __init__(self, l=None, e0=None, d=0.65, eub=None, g=0.05, t0=10, k=0.75):
        self.l = l          # target trajectory length: num_steps = max(1, round(l / e));
                            # None (the default) means the kernel sets its own
                            # trajectory length (NUTS) and num_steps() pins 1.
        self.e0 = e0        # initial step; None -> use HMC's init_step heuristic
        self.d = d          # target acceptance rate
        self.eub = eub      # optional upper bound on the step during tuning
        self.g = g
        self.t0 = t0
        self.k = k

    def init(self, e0, dtype=None):
        e0 = jnp.asarray(e0, dtype=dtype)
        return DualAveragingState(
            m=jnp.log(10.0 * e0),
            barh=jnp.zeros_like(e0),
            logbare=jnp.zeros_like(e0),
            loge=jnp.log(e0),
        )

    def num_steps(self, e):
        """max(1, round(l / e)) as an int32 (traced); 1 when no trajectory
        length was configured (the NUTS case)."""
        if self.l is None:
            return jnp.ones_like(e, dtype=jnp.int32)
        return jnp.maximum(1, jnp.round(self.l / e)).astype(jnp.int32)

    def tune(self, state, rate, idx, return_e):
        """One dual-averaging update at global iteration ``idx`` (0-based).

        ``return_e``: True -> return the instantaneous step (burn-in),
        False -> the averaged step (used from the last burn-in iteration on).
        Both the update and the selection are traced (jnp.where), so the
        tuner runs inside the scanned kernel.
        """
        it = (idx + 1).astype(state.barh.dtype)
        d_w = 1.0 / (it + self.t0)
        e_w = it ** (-self.k)

        barh = (1.0 - d_w) * state.barh + d_w * (self.d - rate)
        loge = state.m - jnp.sqrt(it) * barh / self.g
        if self.eub is not None:
            loge = jnp.minimum(loge, math.log(self.eub))
        logbare = e_w * loge + (1.0 - e_w) * state.logbare

        new_state = DualAveragingState(m=state.m, barh=barh, logbare=logbare, loge=loge)
        e = jnp.where(return_e, jnp.exp(loge), jnp.exp(logbare))
        return new_state, e, self.num_steps(e)
