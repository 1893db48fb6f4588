"""Vihola's Robust Adaptive Metropolis transition kernel.

Reference semantics: /root/reference/eeyore/samplers/ram.py:7-70. Proposal
theta + chol_cov @ z; after every step the Cholesky factor is updated via
chol_cov <- chol( chol (I + h (min(1, exp(log_rate)) - a) z z' / z.z) chol' )
with h = min(1, p * iter^(-g)), targeting acceptance a=0.234 with decay
g=0.7. The factor update runs inside the scan (small-p Cholesky on the VPU).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.samplers.base import TransitionKernel


class RAMState(NamedTuple):
    sample: jax.Array
    target_val: jax.Array
    accepted: jax.Array
    chol_cov: jax.Array


class RAM(TransitionKernel):
    state_keys = ("sample", "target_val", "accepted")
    needs_iteration = True

    def __init__(self, model, cov0=None, a=0.234, g=0.7, offset=0, recompute_current=False):
        super().__init__(model, recompute_current=recompute_current)
        self.a = a
        self.g = g
        self.offset = offset
        self.cov0 = cov0

    def init(self, theta, x, y, key=None):
        theta = jnp.asarray(theta)
        p = theta.shape[-1]
        cov0 = jnp.eye(p, dtype=theta.dtype) if self.cov0 is None else jnp.asarray(self.cov0, dtype=theta.dtype)
        return RAMState(
            sample=theta,
            target_val=self.log_target(theta, x, y),
            accepted=jnp.zeros((), dtype=jnp.int32),
            chol_cov=jnp.linalg.cholesky(cov0),
        )

    def step(self, key, state, x, y, iteration):
        key_z, key_acc = jax.random.split(key)
        dtype = state.sample.dtype
        p = state.sample.shape[-1]

        current_target = (
            self.log_target(state.sample, x, y) if self.recompute_current else state.target_val
        )

        z = jax.random.normal(key_z, state.sample.shape, dtype=dtype)
        proposed_sample = state.sample + state.chol_cov @ z
        proposed_target = self.log_target(proposed_sample, x, y)

        log_rate = proposed_target - current_target
        accept = jnp.log(jax.random.uniform(key_acc, dtype=dtype)) < log_rate

        # ---- rank-1 Cholesky adaptation (reference ram.py:59-64) ----
        it = (iteration + 1 - self.offset).astype(dtype)
        h = jnp.minimum(1.0, p * it ** (-self.g))
        rate = jnp.minimum(1.0, jnp.exp(log_rate))
        middle = jnp.eye(p, dtype=dtype) + h * (rate - self.a) * jnp.outer(z, z) / jnp.dot(z, z)
        new_chol = jnp.linalg.cholesky(state.chol_cov @ middle @ state.chol_cov.T)
        new_chol = jnp.where(jnp.any(jnp.isnan(new_chol)), state.chol_cov, new_chol)

        new_state = RAMState(
            sample=jnp.where(accept, proposed_sample, state.sample),
            target_val=jnp.where(accept, proposed_target, current_target),
            accepted=accept.astype(jnp.int32),
            chol_cov=new_chol,
        )
        info = {k: getattr(new_state, k) for k in self.state_keys}
        return new_state, info
