"""Batch-fused HMC: the whole chain population stepped as [C, P] tensors
with the Pallas fused value+grad kernel in the leapfrog hot loop.

vs. the generic ``vmap(HMC.step)`` path, this driver:
- evaluates log-posterior + gradient for ALL chains in one Pallas kernel
  call per leapfrog step (ops/fused_mlp.py) instead of an autodiff graph;
- adapts ONE step size by dual-averaging on the population-mean acceptance
  (cross-chain adaptation — sharper signal than per-chain tuning and keeps
  the leapfrog trip count uniform across the batch, so no masked lanes);
- records samples as stacked [T, C, P] scan outputs.

This is the headline-benchmark path (BASELINE.md config: HMC on mlp221).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.ops.fused_mlp import make_fused_log_target_vg
from eeyore_tpu.tuners.dual_averaging import HMCDATuner


class FusedHMCState(NamedTuple):
    thetas: jax.Array      # [C, P]
    target_vals: jax.Array  # [C]
    grads: jax.Array       # [C, P]
    step: jax.Array        # scalar
    num_steps: jax.Array   # scalar int32
    tuner: object


class FusedHMC:
    def __init__(self, model, x, y, step=0.1, num_steps=10, tuner=None,
                 max_num_steps=1024, chain_block=1024, interpret=False,
                 use_fused_kernel=True):
        self.model = model
        self.x = jnp.asarray(x, dtype=jnp.float32)
        self.y = jnp.asarray(y, dtype=jnp.float32)
        self.step0 = step
        self.num_steps0 = num_steps
        self.tuner = tuner
        self.max_num_steps = max_num_steps
        if use_fused_kernel:
            self.vg = make_fused_log_target_vg(model, np.asarray(x), np.asarray(y),
                                               chain_block=chain_block, interpret=interpret)
        else:
            self.vg = jax.vmap(
                lambda t: jax.value_and_grad(model.log_target)(t, self.x, self.y))

    def init(self, theta0s):
        theta0s = jnp.asarray(theta0s, dtype=jnp.float32)
        vals, grads = self.vg(theta0s)
        step = jnp.asarray(self.step0, dtype=jnp.float32)
        tuner_state = (self.tuner or HMCDATuner(l=1.0)).init(step, dtype=jnp.float32)
        num_steps = (self.tuner.num_steps(step) if self.tuner is not None
                     else jnp.asarray(self.num_steps0, jnp.int32))
        return FusedHMCState(theta0s, vals, grads, step, num_steps, tuner_state)

    def leapfrog(self, thetas, momenta, grads, step, num_steps):
        momenta = momenta + 0.5 * step * grads

        def cond(c):
            return c[0] < num_steps

        def body(c):
            i, th, mo, tv, gr = c
            th = th + step * mo
            tv, gr = self.vg(th)
            factor = jnp.where(i == num_steps - 1, 0.5, 1.0)
            mo = mo + factor * step * gr
            return (i + 1, th, mo, tv, gr)

        zero_v = jnp.zeros(thetas.shape[0], dtype=thetas.dtype)
        _, thetas, momenta, vals, grads = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), thetas, momenta, zero_v, grads))
        return thetas, -momenta, vals, grads

    def step_fn(self, key, state, iteration, num_burnin_iters):
        key_mom, key_acc = jax.random.split(key)
        C = state.thetas.shape[0]

        momenta = jax.random.normal(key_mom, state.thetas.shape, dtype=jnp.float32)
        h_cur = -state.target_vals + 0.5 * jnp.sum(momenta * momenta, axis=1)

        num_steps = jnp.minimum(state.num_steps, self.max_num_steps)
        prop, prop_mom, prop_vals, prop_grads = self.leapfrog(
            state.thetas, momenta, state.grads, state.step, num_steps)
        h_prop = -prop_vals + 0.5 * jnp.sum(prop_mom * prop_mom, axis=1)

        rates = jnp.minimum(jnp.exp(h_cur - h_prop), 1.0)
        accept = jax.random.uniform(key_acc, (C,), dtype=jnp.float32) < rates

        thetas = jnp.where(accept[:, None], prop, state.thetas)
        vals = jnp.where(accept, prop_vals, state.target_vals)
        grads = jnp.where(accept[:, None], prop_grads, state.grads)

        if self.tuner is not None and num_burnin_iters > 0:
            tune_now = iteration < num_burnin_iters
            return_e = iteration != num_burnin_iters - 1
            mean_rate = jnp.mean(rates)  # population acceptance drives the tuner
            tuner_state, e, n_steps = self.tuner.tune(state.tuner, mean_rate,
                                                      iteration, return_e)
            new_tuner = jax.tree_util.tree_map(
                lambda new, old: jnp.where(tune_now, new, old), tuner_state, state.tuner)
            new_step = jnp.where(tune_now, e, state.step)
            new_num_steps = jnp.where(tune_now, n_steps, state.num_steps)
        else:
            new_tuner, new_step, new_num_steps = state.tuner, state.step, state.num_steps

        new_state = FusedHMCState(thetas, vals, grads, new_step, new_num_steps, new_tuner)
        info = {"sample": thetas, "target_val": vals,
                "accepted": accept.astype(jnp.int32), "rate": rates}
        return new_state, info

    def run(self, key, theta0s, num_iters, num_burnin_iters=0,
            record_keys=("sample", "target_val", "accepted"), jit=True):
        """Returns (final_state, recorded {key: [kept, C, ...]}).

        The jitted program is cached per (num_iters, burnin, record_keys) on
        the instance — repeated runs retrace nothing."""

        def go(key, theta0s):
            state = self.init(theta0s)

            def body(state, i):
                k = jax.random.fold_in(key, i)
                state, info = self.step_fn(k, state, i, num_burnin_iters)
                return state, info

            state, _ = jax.lax.scan(body, state, jnp.arange(num_burnin_iters))

            def body_rec(state, i):
                state, info = body(state, i)
                return state, {kk: info[kk] for kk in record_keys}

            state, recorded = jax.lax.scan(body_rec, state,
                                           jnp.arange(num_burnin_iters, num_iters))
            return state, recorded

        if not jit:
            return go(key, jnp.asarray(theta0s, dtype=jnp.float32))
        cache_key = (num_iters, num_burnin_iters, tuple(record_keys))
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        if cache_key not in self._jit_cache:
            self._jit_cache[cache_key] = jax.jit(go)
        return self._jit_cache[cache_key](key, jnp.asarray(theta0s, dtype=jnp.float32))
