"""Hamiltonian Monte Carlo with leapfrog integration and optional
dual-averaging step-size tuning.

Reference semantics: /root/reference/eeyore/samplers/hmc.py:8-170 — identity
mass matrix, leapfrog with half-steps at both ends and momentum negation
(:100-124), acceptance min(1, exp(H_cur - H_prop)) (:143-148), NUTS
Algorithm-4 init-step doubling heuristic (:38-77), and per-burn-in-iteration
(step, num_steps) updates from the HMCDA tuner (:158-163).

TPU design: the leapfrog is a ``lax.while_loop`` whose trip count is the
(possibly tuner-updated, hence traced) ``num_steps`` carried in the kernel
state; each step costs one fused value-and-grad of the log target — the hot
primitive. Under vmap, lanes whose trajectory finished idle until the longest
lane completes, so post-burn-in runs freeze (step, num_steps) to the tuned
values (see runner.freeze_hmc) for a static trip count.
"""


from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.samplers.base import TransitionKernel
from eeyore_tpu.tuners.dual_averaging import DualAveragingState, HMCDATuner


class HMCState(NamedTuple):
    sample: jax.Array
    target_val: jax.Array
    grad_val: jax.Array
    momentum: jax.Array      # starting momentum of the last trajectory
    hamiltonian: jax.Array   # starting Hamiltonian of the last trajectory
    accepted: jax.Array
    step: jax.Array          # current leapfrog step size (tuner-dynamic)
    num_steps: jax.Array     # current trajectory length (int32, tuner-dynamic)
    tuner: DualAveragingState


class HMC(TransitionKernel):
    state_keys = ("sample", "target_val", "grad_val", "momentum", "hamiltonian", "accepted")
    needs_iteration = True

    def __init__(self, model, step=0.1, num_steps=10, tuner=None, max_num_steps=None,
                 num_burnin_iters=0, recompute_current=False, l_rounding="round"):
        super().__init__(model, recompute_current=recompute_current)
        self.step0 = step
        self.num_steps0 = num_steps
        # how kernel backends freeze the tuner's l-rule trajectory length at
        # burn-in end: 'round' = reference hmcda_tuner.py:55-58 semantics;
        # 'stochastic' = per-chain floor/ceil (mean exactly l, seed-stable
        # wall — ops/resident_hmc.py docstring). Scanned chains tune per
        # chain and re-round every iteration, so only the kernels consume it.
        if l_rounding not in ("round", "stochastic"):
            raise ValueError(f"l_rounding must be 'round' or 'stochastic', "
                             f"got {l_rounding!r}")
        self.l_rounding = l_rounding
        if tuner is not None and tuner.l is None and type(self) is HMC:
            raise ValueError(
                "HMC's dual-averaging tuner needs a target trajectory length: "
                "pass HMCDATuner(l=...) (num_steps = round(l / step)); only "
                "NUTS, which picks its own trajectories, can omit l")
        self.tuner = tuner
        # None = the scanned default ceiling 1024; kernel dispatch treats an
        # EXPLICIT ceiling > its unroll cap as ineligible (no silent clamp)
        # but may cap the default one (samplers/dispatch.py)
        self.explicit_max_num_steps = max_num_steps is not None
        self.max_num_steps = 1024 if max_num_steps is None else max_num_steps
        # Tuning runs while iteration < num_burnin_iters (reference hmc.py:158-163);
        # the runner sets this before tracing.
        self.num_burnin_iters = num_burnin_iters

    # ---- Hamiltonian pieces (reference hmc.py:91-98) ----

    def kinetic_energy(self, momentum):
        return 0.5 * jnp.sum(momentum * momentum)

    def hamiltonian(self, potential, momentum):
        return potential + self.kinetic_energy(momentum)

    # ---- leapfrog (reference hmc.py:100-124) ----

    def leapfrog(self, position, momentum, grad, step, num_steps, x, y):
        """Leapfrog trajectory. ``grad`` is the gradient of the log target at
        ``position`` (so the initial half-step reuses the cached gradient —
        num_steps fresh evaluations per trajectory).

        Returns (position, momentum, target_val, grad_val)."""
        momentum = momentum + 0.5 * step * grad  # grad of LOG TARGET = -grad potential

        def cond(carry):
            i, *_ = carry
            return i < num_steps

        def body(carry):
            i, pos, mom, tgt, grd = carry
            pos = pos + step * mom
            tgt, grd = self.upto_grad_log_target(pos, x, y)
            # full momentum step except at the trajectory end (half step)
            factor = jnp.where(i == num_steps - 1, 0.5, 1.0)
            mom = mom + factor * step * grd
            return (i + 1, pos, mom, tgt, grd)

        zero_t = jnp.zeros((), dtype=position.dtype)
        _, position, momentum, target, grad = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), position, momentum, zero_t, grad)
        )
        momentum = -momentum
        return position, momentum, target, grad

    def init(self, theta, x, y, key=None):
        theta = jnp.asarray(theta)
        target, grad = self.upto_grad_log_target(theta, x, y)
        dtype = theta.dtype

        step = self.step0
        num_steps = self.num_steps0
        tuner_state = None
        if self.tuner is not None:
            if self.tuner.e0 is not None:
                step = self.tuner.e0
            elif key is not None:
                # minibatch runs cycle data batches while doubling, like the
                # reference's init_step (hmc.py:62-66); the runners stash the
                # schedule on the kernel before tracing
                sched = getattr(self, "init_schedule", None)
                if sched is not None and sched.num_batches == 1:
                    sched = None
                step = self.find_initial_step(key, theta, x, y, schedule=sched)
                if self.tuner.eub is not None:
                    step = jnp.minimum(step, self.tuner.eub)
            tuner_state = self.tuner.init(step, dtype=dtype)
            num_steps = self.tuner.num_steps(jnp.asarray(step, dtype=dtype))
        else:
            tuner_state = HMCDATuner(l=1.0).init(step, dtype=dtype)  # inert placeholder

        return HMCState(
            sample=theta,
            target_val=target,
            grad_val=grad,
            momentum=jnp.zeros_like(theta),
            hamiltonian=jnp.zeros((), dtype=dtype),
            accepted=jnp.zeros((), dtype=jnp.int32),
            step=jnp.asarray(step, dtype=dtype),
            num_steps=jnp.asarray(num_steps, dtype=jnp.int32),
            tuner=tuner_state,
        )

    def find_initial_step(self, key, theta, x, y, max_doublings=100,
                          schedule=None):
        """NUTS Algorithm-4 heuristic (reference hmc.py:38-77): from step=1,
        repeatedly scale by 2^a (a = +-1 fixed by the first acceptance ratio)
        until the one-step acceptance ratio crosses 1/2.

        With a minibatch ``schedule``, each doubling advances to the next
        data batch and re-evaluates BOTH the current Hamiltonian and the
        one-step proposal on it — the reference cycles its dataloader this
        way per doubling (hmc.py:62-72). Full-batch (schedule=None) keeps
        the single (x, y) evaluation."""
        theta = jnp.asarray(theta)
        dtype = theta.dtype
        momentum0 = jax.random.normal(key, theta.shape, dtype=dtype)

        def ratio_for(step, batch_idx):
            if schedule is None:
                xb, yb = x, y
            else:
                xb, yb = schedule.batch(batch_idx)
            target0, grad0 = self.upto_grad_log_target(theta, xb, yb)
            h0 = self.hamiltonian(-target0, momentum0)
            pos, mom, tgt, _ = self.leapfrog(theta, momentum0, grad0, step, 1, xb, yb)
            h1 = self.hamiltonian(-tgt, mom)
            return jnp.exp(h0 - h1)

        num_batches = 1 if schedule is None else schedule.num_batches
        step = jnp.asarray(1.0, dtype=dtype)
        ratio = ratio_for(step, jnp.zeros((), jnp.int32))
        a = jnp.where(ratio > 0.5, 1.0, -1.0).astype(dtype)

        def cond(carry):
            step, ratio, it = carry
            return jnp.logical_and(ratio**a > 2.0**(-a), it < max_doublings)

        def body(carry):
            step, _, it = carry
            step = step * 2.0**a
            return (step, ratio_for(step, (it + 1) % num_batches), it + 1)

        step, _, _ = jax.lax.while_loop(cond, body, (step, ratio, jnp.zeros((), jnp.int32)))
        return step

    def step_fn(self, key, state, x, y, iteration):
        key_mom, key_acc = jax.random.split(key)
        dtype = state.sample.dtype

        if self.recompute_current:
            current_target, current_grad = self.upto_grad_log_target(state.sample, x, y)
        else:
            current_target, current_grad = state.target_val, state.grad_val

        momentum0 = jax.random.normal(key_mom, state.sample.shape, dtype=dtype)
        h_current = self.hamiltonian(-current_target, momentum0)

        num_steps = jnp.minimum(state.num_steps, self.max_num_steps)
        pos, mom, target, grad = self.leapfrog(
            state.sample, momentum0, current_grad, state.step, num_steps, x, y
        )
        h_proposed = self.hamiltonian(-target, mom)

        rate = jnp.minimum(jnp.exp(h_current - h_proposed), 1.0)
        accept = jax.random.uniform(key_acc, dtype=dtype) < rate

        new_sample = jnp.where(accept, pos, state.sample)
        new_target = jnp.where(accept, target, current_target)
        new_grad = jnp.where(accept, grad, current_grad)

        # Dual-averaging tuning during burn-in (reference hmc.py:158-163):
        # the last burn-in iteration switches to the averaged step.
        if self.tuner is not None and self.num_burnin_iters > 0:
            tune_now = iteration < self.num_burnin_iters
            return_e = iteration != self.num_burnin_iters - 1
            tuner_state, e, n_steps = self.tuner.tune(state.tuner, rate, iteration, return_e)
            new_tuner = jax.tree_util.tree_map(
                lambda new, old: jnp.where(tune_now, new, old), tuner_state, state.tuner
            )
            new_step = jnp.where(tune_now, e, state.step)
            new_num_steps = jnp.where(tune_now, n_steps, state.num_steps)
        else:
            new_tuner, new_step, new_num_steps = state.tuner, state.step, state.num_steps

        new_state = HMCState(
            sample=new_sample,
            target_val=new_target,
            grad_val=new_grad,
            momentum=momentum0,
            hamiltonian=h_current,
            accepted=accept.astype(jnp.int32),
            step=new_step,
            num_steps=new_num_steps,
            tuner=new_tuner,
        )
        info = {k: getattr(new_state, k) for k in self.state_keys}
        return new_state, info

    def step(self, key, state, x, y, iteration):
        return self.step_fn(key, state, x, y, iteration)
