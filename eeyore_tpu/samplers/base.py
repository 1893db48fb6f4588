"""Transition-kernel protocol: samplers as pure functions.

The reference's sampler idiom — mutate nn.Module params in place, one Python
object per chain, Python loop per iteration (serial_sampler.py:41-52) —
inverts on TPU to: explicit state pytrees + ``step(key, state, x, y) ->
(state, info)`` pure transition kernels, scanned over iterations with
``lax.scan``, vmapped over chains, sharded over meshes.

Minibatch semantics follow the reference: when the schedule has more than one
batch, the CURRENT state's target (and grad) is recomputed on the incoming
batch before proposing (metropolis_hastings.py:44-45, mala.py:49-51,
hmc.py:129-131) — a pseudo-marginal-style variant; full-batch mode caches it.
"""

import jax
import jax.numpy as jnp


def tree_where(pred, a, b):
    """Branchless accept/reject over a state pytree."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


class TransitionKernel:
    """Base transition kernel bound to a model.

    Subclasses define:
    - ``state_keys``: info keys recorded per iteration (the reference's
      ``self.keys``),
    - ``init(theta, x, y) -> state``,
    - ``step(key, state, x, y, iteration) -> (state, info)``.
    """

    state_keys = ("sample", "target_val", "accepted")
    needs_iteration = False  # True for kernels whose update depends on the global iter idx

    def __init__(self, model, recompute_current=False):
        self.model = model
        self.recompute_current = recompute_current

    def init(self, theta, x, y, key=None):
        raise NotImplementedError

    def step(self, key, state, x, y, iteration):
        raise NotImplementedError

    def log_target(self, theta, x, y):
        return self.model.log_target(theta, x, y)

    def upto_grad_log_target(self, theta, x, y):
        return self.model.upto_grad_log_target(theta, x, y)
