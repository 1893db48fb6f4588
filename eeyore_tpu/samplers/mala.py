"""Metropolis-adjusted Langevin (MALA) transition kernel.

Reference semantics: /root/reference/eeyore/samplers/mala.py:9-82. Proposal
mean theta + 0.5 * step * grad, iid Normal scale sqrt(step) (:35-41); always
applies the asymmetric Hastings correction with the reverse kernel centered
at the proposed state's drift (:58-64). One fused value-and-grad per proposal.
"""

import math

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.samplers.base import TransitionKernel


class MALAState(NamedTuple):
    sample: jax.Array
    target_val: jax.Array
    grad_val: jax.Array
    accepted: jax.Array


class MALA(TransitionKernel):
    state_keys = ("sample", "target_val", "grad_val", "accepted")

    def __init__(self, model, step=0.1, recompute_current=False):
        super().__init__(model, recompute_current=recompute_current)
        self.step_size = step

    def kernel_mean(self, sample, grad):
        return sample + 0.5 * self.step_size * grad

    def _normal_log_prob(self, x, loc):
        scale = math.sqrt(self.step_size)
        z = (x - loc) / scale
        return jnp.sum(-0.5 * z * z - math.log(scale) - 0.5 * math.log(2.0 * math.pi))

    def init(self, theta, x, y, key=None):
        theta = jnp.asarray(theta)
        target, grad = self.upto_grad_log_target(theta, x, y)
        return MALAState(
            sample=theta,
            target_val=target,
            grad_val=grad,
            accepted=jnp.zeros((), dtype=jnp.int32),
        )

    def step_fn(self, key, state, x, y):
        key_prop, key_acc = jax.random.split(key)

        if self.recompute_current:
            current_target, current_grad = self.upto_grad_log_target(state.sample, x, y)
        else:
            current_target, current_grad = state.target_val, state.grad_val

        fwd_mean = self.kernel_mean(state.sample, current_grad)
        noise = jax.random.normal(key_prop, state.sample.shape, dtype=state.sample.dtype)
        proposed_sample = fwd_mean + math.sqrt(self.step_size) * noise

        proposed_target, proposed_grad = self.upto_grad_log_target(proposed_sample, x, y)

        rev_mean = self.kernel_mean(proposed_sample, proposed_grad)
        log_rate = (
            proposed_target
            - current_target
            - self._normal_log_prob(proposed_sample, fwd_mean)
            + self._normal_log_prob(state.sample, rev_mean)
        )

        u = jax.random.uniform(key_acc, dtype=proposed_target.dtype)
        accept = jnp.log(u) < log_rate

        new_state = MALAState(
            sample=jnp.where(accept, proposed_sample, state.sample),
            target_val=jnp.where(accept, proposed_target, current_target),
            grad_val=jnp.where(accept, proposed_grad, current_grad),
            accepted=accept.astype(jnp.int32),
        )
        return new_state, new_state._asdict()

    def step(self, key, state, x, y, iteration=None):
        return self.step_fn(key, state, x, y)
