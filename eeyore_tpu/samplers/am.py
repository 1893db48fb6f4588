"""Haario-style Adaptive Metropolis transition kernel.

Reference semantics: /root/reference/eeyore/samplers/am.py:8-107. After t0
iterations the proposal is a mixture: with probability l an isotropic
c * N(0, I) step, else b * chol(cov_est) @ N(0, I) using the empirical
covariance maintained from a running mean and a sum-of-outer-products
accumulator: cov = (cov_sum - (k+1) m m') / k (:57-59, :91-99). Falls back
to cov0 while nothing has been accepted; optional ``transform`` (e.g.
stats.softabs) PD-ifies the covariance. All adaptation state lives in the
scan carry; accept/reject and the t0 gate are branchless.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.samplers.base import TransitionKernel
from eeyore_tpu.stats.means import recursive_mean


class AMState(NamedTuple):
    sample: jax.Array
    target_val: jax.Array
    accepted: jax.Array
    running_mean: jax.Array
    cov_sum: jax.Array
    cov: jax.Array
    num_accepted: jax.Array


class AM(TransitionKernel):
    state_keys = ("sample", "target_val", "accepted")
    needs_iteration = True

    def __init__(self, model, cov0=None, l=0.05, b=1.0, c=1.0, t0=2, transform=None,
                 offset=0, recompute_current=False):
        super().__init__(model, recompute_current=recompute_current)
        self.l = l
        self.b = b
        self.c = c
        self.t0 = t0
        self.transform = transform
        self.offset = offset
        self.cov0 = cov0

    def _cov0(self, num_params, dtype):
        cov0 = jnp.eye(num_params, dtype=dtype) if self.cov0 is None else jnp.asarray(self.cov0, dtype=dtype)
        if self.transform is not None:
            cov0 = self.transform(cov0)
        return cov0

    def init(self, theta, x, y, key=None):
        theta = jnp.asarray(theta)
        p = theta.shape[-1]
        cov0 = self._cov0(p, theta.dtype)
        return AMState(
            sample=theta,
            target_val=self.log_target(theta, x, y),
            accepted=jnp.zeros((), dtype=jnp.int32),
            running_mean=jnp.zeros(p, dtype=theta.dtype),
            cov_sum=jnp.zeros((p, p), dtype=theta.dtype),
            cov=cov0,
            num_accepted=jnp.zeros((), dtype=jnp.int32),
        )

    def step(self, key, state, x, y, iteration):
        key_z, key_mix, key_acc = jax.random.split(key, 3)
        dtype = state.sample.dtype
        p = state.sample.shape[-1]

        current_target = (
            self.log_target(state.sample, x, y) if self.recompute_current else state.target_val
        )

        z = jax.random.normal(key_z, state.sample.shape, dtype=dtype)
        iso_step = self.c * z
        # chol of the adapted covariance; unselected-branch NaNs are masked by where
        chol = jnp.linalg.cholesky(state.cov)
        adapted_step = self.b * (chol @ z)
        adapted_step = jnp.where(jnp.any(jnp.isnan(adapted_step)), iso_step, adapted_step)

        use_adapted = jnp.logical_and(
            iteration + 1 - self.offset > self.t0,
            jax.random.uniform(key_mix, dtype=dtype) >= self.l,
        )
        proposed_sample = state.sample + jnp.where(use_adapted, adapted_step, iso_step)
        proposed_target = self.log_target(proposed_sample, x, y)

        log_rate = proposed_target - current_target
        accept = jnp.log(jax.random.uniform(key_acc, dtype=dtype)) < log_rate

        new_sample = jnp.where(accept, proposed_sample, state.sample)
        new_target = jnp.where(accept, proposed_target, current_target)
        num_accepted = state.num_accepted + jnp.where(
            jnp.logical_and(accept, iteration > 0), 1, 0
        )

        # ---- covariance adaptation (reference am.py:91-99) ----
        new_mean = recursive_mean(state.running_mean, iteration + 1, new_sample, offset=self.offset)
        new_cov_sum = state.cov_sum + jnp.outer(new_sample, new_sample)

        k = (iteration - self.offset).astype(dtype)
        est_cov = (new_cov_sum - (k + 1.0) * jnp.outer(new_mean, new_mean)) / jnp.maximum(k, 1.0)
        if self.transform is not None:
            est_cov = self.transform(est_cov)
        cov0 = self._cov0(p, dtype)
        adapted_cov = jnp.where(num_accepted == 0, cov0, est_cov)
        new_cov = jnp.where(iteration + 1 - self.offset >= self.t0, adapted_cov, state.cov)

        new_state = AMState(
            sample=new_sample,
            target_val=new_target,
            accepted=accept.astype(jnp.int32),
            running_mean=new_mean,
            cov_sum=new_cov_sum,
            cov=new_cov,
            num_accepted=num_accepted,
        )
        info = {k_: getattr(new_state, k_) for k_ in self.state_keys}
        return new_state, info
