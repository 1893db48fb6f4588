"""Differential-evolution MCMC (ter Braak 2006) population sampler.

The reference ships the DEMC proposal kernel with no sampler attached
(/root/reference/eeyore/kernels/demc_kernel.py:7-38, plus the unused partner
selection helpers stats/random.py:5-13) — this module completes the
capability: each walker proposes theta_i + c * (theta_a - theta_b) + scale*z
with a, b two distinct other walkers, accepted by an MH test on the shared
log target. Partner draws are vectorized exclusion-shifted randints; the
whole population steps in parallel against the start-of-iteration ensemble.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.samplers.population import PopulationKernel


class DEMCState(NamedTuple):
    sample: jax.Array       # [C, p]
    target_val: jax.Array   # [C]
    accepted: jax.Array     # [C]


class DEMC(PopulationKernel):
    state_keys = ("sample", "target_val", "accepted")

    def __init__(self, model, c=None, scale=1e-3, recompute_current=False):
        super().__init__(model, recompute_current=recompute_current)
        self.c = c        # None -> 2.38 / sqrt(2 p) default at init
        self.scale = scale

    def _gamma(self, p):
        return self.c if self.c is not None else 2.38 / jnp.sqrt(2.0 * p)

    def init(self, thetas, x, y, key=None):
        thetas = jnp.asarray(thetas)
        targets = jax.vmap(lambda t: self.model.log_target(t, x, y))(thetas)
        return DEMCState(
            sample=thetas,
            target_val=targets,
            accepted=jnp.zeros(thetas.shape[0], dtype=jnp.int32),
        )

    def _partners(self, key, num):
        """For each walker i: two distinct partners a, b, both != i.
        Exclusion-shifted uniform draws (exact, no rejection loop)."""
        idx = jnp.arange(num)
        key_a, key_b = jax.random.split(key)
        a = jax.random.randint(key_a, (num,), 0, num - 1)
        a = jnp.where(a >= idx, a + 1, a)  # a != i
        b = jax.random.randint(key_b, (num,), 0, num - 2)
        lo = jnp.minimum(idx, a)
        hi = jnp.maximum(idx, a)
        b = jnp.where(b >= lo, b + 1, b)
        b = jnp.where(b >= hi, b + 1, b)  # b != i, b != a
        return a, b

    def step(self, key, state, x, y, iteration=None):
        key_p, key_z, key_acc = jax.random.split(key, 3)
        num, p = state.sample.shape
        dtype = state.sample.dtype

        if self.recompute_current:
            current_target = jax.vmap(lambda t: self.model.log_target(t, x, y))(state.sample)
        else:
            current_target = state.target_val

        a, b = self._partners(key_p, num)
        diff = state.sample[a] - state.sample[b]
        z = jax.random.normal(key_z, state.sample.shape, dtype=dtype)
        proposed = state.sample + self._gamma(p) * diff + self.scale * z
        proposed_target = jax.vmap(lambda t: self.model.log_target(t, x, y))(proposed)

        log_rate = proposed_target - current_target
        u = jax.random.uniform(key_acc, (num,), dtype=dtype)
        accept = jnp.log(u) < log_rate

        new_state = DEMCState(
            sample=jnp.where(accept[:, None], proposed, state.sample),
            target_val=jnp.where(accept, proposed_target, current_target),
            accepted=accept.astype(jnp.int32),
        )
        return new_state, new_state._asdict()
