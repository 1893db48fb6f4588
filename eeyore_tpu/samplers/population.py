"""Population kernels: samplers whose state is a whole particle ensemble.

Used by DEMC (walkers propose from ensemble differences) and shared by the
runner ``sample_population``: state pytrees carry [num_walkers, ...] leaves,
stepped jointly inside one ``lax.scan``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.chains import ChainLists
from eeyore_tpu.datasets import as_schedule


class PopulationKernel:
    """Like TransitionKernel, but init takes thetas [C, p] and step advances
    the whole population."""

    state_keys = ("sample", "target_val", "accepted")

    def __init__(self, model, recompute_current=False):
        self.model = model
        self.recompute_current = recompute_current

    def init(self, thetas, x, y, key=None):
        raise NotImplementedError

    def step(self, key, state, x, y, iteration):
        raise NotImplementedError


def sample_population(kernel, key, theta0s, data, num_iters, num_burnin_iters=0,
                      record_keys=None, jit=True, return_state=False, return_arrays=False):
    """Run a population kernel; returns ChainLists with per-walker chains
    [num_walkers, kept_iters, ...]."""
    schedule = as_schedule(data)
    kernel.recompute_current = schedule.num_batches != 1
    record_keys = tuple(record_keys or kernel.state_keys)

    def run(key, theta0s):
        init_key, chain_key = jax.random.split(key)
        xb, yb = schedule.batch(0)
        state = kernel.init(theta0s, xb, yb, key=init_key)

        def body(state, i):
            k = jax.random.fold_in(chain_key, i)
            xb, yb = schedule.batch(i)
            state, info = kernel.step(k, state, xb, yb, i)
            return state, info

        state, _ = jax.lax.scan(body, state, jnp.arange(num_burnin_iters))

        def body_rec(state, i):
            state, info = body(state, i)
            return state, {k: info[k] for k in record_keys}

        state, recorded = jax.lax.scan(
            body_rec, state, jnp.arange(num_burnin_iters, num_iters)
        )
        return state, recorded

    if jit:
        # per-kernel jit cache, like runner._cached_jit: repeated runs with
        # the same iteration plan must reuse the compiled program instead
        # of retracing a fresh closure each call (keyed on the schedule's
        # identity — its arrays are baked in as constants; the entry keeps
        # the schedule alive so ids cannot be recycled)
        cache = getattr(kernel, "_pop_jit_cache", None)
        if cache is None:
            cache = kernel._pop_jit_cache = {}
        cache_key = (id(schedule), num_iters, num_burnin_iters, record_keys,
                     kernel.recompute_current)
        if cache_key not in cache:
            cache[cache_key] = (jax.jit(run), schedule)
        fn = cache[cache_key][0]
    else:
        fn = run
    state, recorded = fn(key, jnp.asarray(theta0s))

    if return_arrays:
        return (recorded, state) if return_state else recorded
    # recorded leaves are [kept_iters, num_walkers, ...] -> chain-major
    arrays = {k: np.moveaxis(np.asarray(v), 0, 1) for k, v in recorded.items()}
    chains = ChainLists.from_arrays(arrays)
    return (chains, state) if return_state else chains
