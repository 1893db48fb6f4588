"""Random-walk Metropolis-Hastings transition kernel.

Reference semantics: /root/reference/eeyore/samplers/metropolis_hastings.py:8-73.
Default proposal: iid Normal centered at the current state with unit scale
(:25-28). Asymmetric mode subtracts the forward and adds the reverse proposal
log-density (:50-54). Accept if log U < log_rate; the accept/reject branch is
a branchless ``tree_where`` here.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.kernels import NormalKernel
from eeyore_tpu.samplers.base import TransitionKernel, tree_where


class MHState(NamedTuple):
    sample: jax.Array
    target_val: jax.Array
    accepted: jax.Array


class MetropolisHastings(TransitionKernel):
    state_keys = ("sample", "target_val", "accepted")

    def __init__(self, model, symmetric=True, kernel=None, scale=1.0, recompute_current=False):
        super().__init__(model, recompute_current=recompute_current)
        self.symmetric = symmetric
        self.kernel = kernel or NormalKernel(scale)

    def init(self, theta, x, y, key=None):
        theta = jnp.asarray(theta)
        return MHState(
            sample=theta,
            target_val=self.log_target(theta, x, y),
            accepted=jnp.zeros((), dtype=jnp.int32),
        )

    def step(self, key, state, x, y, iteration=None):
        key_prop, key_acc = jax.random.split(key)

        current_target = (
            self.log_target(state.sample, x, y) if self.recompute_current else state.target_val
        )

        proposed_sample = self.kernel.sample(key_prop, state.sample)
        proposed_target = self.log_target(proposed_sample, x, y)

        log_rate = proposed_target - current_target
        if not self.symmetric:
            log_rate = log_rate - self.kernel.log_prob(proposed_sample, state.sample)
            log_rate = log_rate + self.kernel.log_prob(state.sample, proposed_sample)

        u = jax.random.uniform(key_acc, dtype=proposed_target.dtype)
        accept = jnp.log(u) < log_rate

        new_state = MHState(
            sample=jnp.where(accept, proposed_sample, state.sample),
            target_val=jnp.where(accept, proposed_target, current_target),
            accepted=accept.astype(jnp.int32),
        )
        info = new_state._asdict()
        return new_state, info
