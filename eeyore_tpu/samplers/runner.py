"""Chain runners: jit-compiled two-phase scans, vmapped over chains.

The reference's run loop — ``for epoch: for batch: draw()`` with burn-in
states discarded (serial_sampler.py:35-52) — becomes two ``lax.scan``s inside
one jitted function per phase: a burn-in scan carrying only the kernel state
(no recorded outputs, so XLA allocates nothing per iteration), then a
sampling scan whose stacked outputs ARE the chain. Epoch/burn-in accounting
matches DataCounter semantics: num_iters = num_epochs * num_batches.

Many chains = ``jax.vmap`` over (key, theta0) — thousands of chains per chip
in one executable; multi-chip sharding lives in eeyore_tpu.parallel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.chains import ChainList, ChainLists
from eeyore_tpu.datasets import as_schedule


def _phase_scan(kernel, key, state, schedule, start, length, record_keys, thin=1):
    """Scan ``length`` iterations starting at global iteration ``start``,
    recording every ``thin``-th state (the last of each thin-block)."""
    if length == 0:
        return state, None

    def step_at(state, i, record):
        k = jax.random.fold_in(key, i)
        xb, yb = schedule.batch(i)
        state, info = kernel.step(k, state, xb, yb, i)
        if not record:
            return state, None
        return state, {kk: info[kk] for kk in record_keys}

    if record_keys is None or thin == 1:
        def body(state, i):
            return step_at(state, i, record_keys is not None)

        # start + arange(length) (not arange(start, ...)) so ``start`` may be
        # a traced scalar — the harness's verbose segmented runner reuses one
        # compiled segment across all start offsets
        return jax.lax.scan(body, state, start + jnp.arange(length))

    def thin_block(state, j):
        base = start + j * thin

        def silent(state, i):
            state, _ = step_at(state, i, False)
            return state, None

        state, _ = jax.lax.scan(silent, state, base + jnp.arange(thin - 1))
        return step_at(state, base + thin - 1, True)

    return jax.lax.scan(thin_block, state, jnp.arange(length // thin))


def run_fn(kernel, schedule, num_iters, num_burnin_iters, record_keys, record_thin=1):
    """Build the pure (key, theta0) -> (final_state, recorded) function."""
    # kernels whose init needs more than batch 0 (HMC's init_step doubling
    # heuristic cycles data batches, reference hmc.py:62-66) read this
    kernel.init_schedule = schedule

    def run(key, theta0):
        init_key, chain_key = jax.random.split(key)
        xb, yb = schedule.batch(0)
        state = kernel.init(theta0, xb, yb, key=init_key)
        state, _ = _phase_scan(kernel, chain_key, state, schedule, 0, num_burnin_iters, None)
        state, recorded = _phase_scan(
            kernel, chain_key, state, schedule, num_burnin_iters, num_iters - num_burnin_iters,
            record_keys, thin=record_thin,
        )
        return state, recorded

    return run


def _cached_jit(kernel, schedule, num_iters, num_burnin_iters, record_keys, vmapped,
                record_thin=1):
    """Per-kernel jit cache: repeated runs with the same iteration plan reuse
    the compiled program instead of retracing a fresh closure."""
    cache = getattr(kernel, "_jit_cache", None)
    if cache is None:
        cache = kernel._jit_cache = {}
    # keyed on the schedule's identity (its arrays are baked into the traced
    # program as constants); the cache entry keeps the schedule alive so ids
    # cannot be recycled
    cache_key = (id(schedule), num_iters, num_burnin_iters, record_keys, vmapped,
                 kernel.recompute_current, getattr(kernel, "num_burnin_iters", None),
                 record_thin)
    if cache_key not in cache:
        fn = run_fn(kernel, schedule, num_iters, num_burnin_iters, record_keys,
                    record_thin=record_thin)
        if vmapped:
            fn = jax.vmap(fn)
        cache[cache_key] = (jax.jit(fn), schedule)
    return cache[cache_key][0]


def _check_thin(num_iters, num_burnin_iters, record_thin):
    kept_span = num_iters - num_burnin_iters
    if record_thin < 1 or kept_span % record_thin:
        raise ValueError(
            f"record_thin={record_thin} must divide the {kept_span} "
            "post-burn-in iterations")


def sample_chain(kernel, key, theta0, data, num_iters, num_burnin_iters=0,
                 record_keys=None, jit=True, return_state=False, record_thin=1,
                 backend="auto"):
    """Run one chain; returns a ChainList of the post-burn-in states.

    ``num_iters`` counts ALL iterations including burn-in (the reference's
    epochs x batches), ``num_burnin_iters`` of which are discarded.
    ``record_thin`` keeps every thin-th post-burn-in state (the chain holds
    ``(num_iters - num_burnin_iters) / record_thin`` rows).

    ``backend``: "auto" (default) routes eligible configs on TPU onto the
    whole-loop Pallas kernels (samplers/dispatch.py): the kernel runs ONE
    chain_block of chains sharing this chain's theta0 (lanes diverge through
    the on-core PRNG) and chain 0 is returned — kernel-class per-iteration
    wall for the price of a block. Kernel-backed chains record
    sample/accepted only and draws are not bit-matched to jax.random; pass
    "scan" for the generic path.
    """
    schedule = as_schedule(data)
    _check_thin(num_iters, num_burnin_iters, record_thin)
    if getattr(kernel, "auto_depth", False):
        kernel.resolve_auto_budget(
            schedule, key=key,
            theta0s=jnp.asarray(theta0)[None]
            if not hasattr(kernel.model, "prior") else None)
    if jit and backend != "scan":
        from eeyore_tpu.samplers.dispatch import resolve_backend, run_kernel_backend

        plan, _reason = resolve_backend(
            kernel, schedule, 1024, num_iters, num_burnin_iters, record_thin,
            backend=backend, record_keys=record_keys)
        if plan is not None:
            kernel.recompute_current = False
            if hasattr(kernel, "num_burnin_iters"):
                kernel.num_burnin_iters = num_burnin_iters
            theta0 = jnp.asarray(theta0, jnp.float32)
            theta0s = jnp.broadcast_to(theta0, (plan.chain_block,) + theta0.shape)
            recorded, info = run_kernel_backend(
                kernel, key, theta0s, schedule, num_iters, num_burnin_iters,
                plan, record_thin)
            if record_keys is not None:
                recorded = {k: v for k, v in recorded.items()
                            if k in record_keys}
            chain = ChainList.from_arrays(
                {k: np.asarray(v[0]) for k, v in recorded.items()})
            if not return_state:
                return chain
            xb, yb = schedule.batch(0)
            state = kernel.init(jnp.asarray(info["final"][0]), xb, yb)
            return chain, state
    kernel.recompute_current = schedule.num_batches != 1
    if hasattr(kernel, "num_burnin_iters"):
        kernel.num_burnin_iters = num_burnin_iters  # gates in-scan tuning (HMC)
    record_keys = tuple(record_keys or kernel.state_keys)

    if jit:
        fn = _cached_jit(kernel, schedule, num_iters, num_burnin_iters, record_keys,
                         False, record_thin)
    else:
        fn = run_fn(kernel, schedule, num_iters, num_burnin_iters, record_keys,
                    record_thin=record_thin)
    state, recorded = fn(key, jnp.asarray(theta0))
    chain = ChainList.from_arrays({k: np.asarray(v) for k, v in recorded.items()})
    return (chain, state) if return_state else chain


def sample_chains(kernel, key, theta0s, data, num_iters, num_burnin_iters=0,
                  record_keys=None, jit=True, return_state=False, return_arrays=False,
                  record_thin=1, backend="auto"):
    """Run many chains at once: vmap over (key, theta0).

    ``theta0s``: [num_chains, num_params]. Returns a ChainLists (or the raw
    stacked arrays {key: [num_chains, kept_iters, ...]} with
    ``return_arrays=True`` — the TPU-native path, no host conversion).
    ``record_thin`` keeps every thin-th post-burn-in state.

    ``backend``: "auto" (default) routes eligible configs on TPU onto the
    whole-loop Pallas kernels (20-500x the scanned path on the reference's
    workloads — see samplers/dispatch.py for eligibility and the recorded-key
    contract); "scan" forces the generic jit(vmap(scan)) path;
    "dense"/"resident" demand a specific kernel family and raise when
    ineligible. Kernel-backed runs record sample/accepted only and are not
    bit-matched to the scanned path's jax.random draws.
    """
    schedule = as_schedule(data)
    _check_thin(num_iters, num_burnin_iters, record_thin)
    if getattr(kernel, "auto_depth", False):
        kernel.resolve_auto_budget(
            schedule, key=key,
            theta0s=theta0s if not hasattr(kernel.model, "prior") else None)
    if jit and backend != "scan":
        from eeyore_tpu.samplers.dispatch import resolve_backend, run_kernel_backend

        plan, _reason = resolve_backend(
            kernel, schedule, jnp.asarray(theta0s).shape[0], num_iters,
            num_burnin_iters, record_thin, backend=backend,
            record_keys=record_keys)
        if plan is not None:
            kernel.recompute_current = False
            if hasattr(kernel, "num_burnin_iters"):
                kernel.num_burnin_iters = num_burnin_iters
            recorded, info = run_kernel_backend(
                kernel, key, theta0s, schedule, num_iters, num_burnin_iters,
                plan, record_thin,
                needs_accepted=(record_keys is None
                                or "accepted" in record_keys))
            if record_keys is not None:
                recorded = {k: v for k, v in recorded.items()
                            if k in record_keys}
            if not return_state:
                if return_arrays:
                    return recorded
                return ChainLists.from_arrays(
                    {k: np.asarray(v) for k, v in recorded.items()})
            xb, yb = schedule.batch(0)
            state = jax.vmap(lambda th: kernel.init(th, xb, yb))(
                jnp.asarray(info["final"]))
            if return_arrays:
                return recorded, state
            chains = ChainLists.from_arrays(
                {k: np.asarray(v) for k, v in recorded.items()})
            return chains, state
    kernel.recompute_current = schedule.num_batches != 1
    if hasattr(kernel, "num_burnin_iters"):
        kernel.num_burnin_iters = num_burnin_iters  # gates in-scan tuning (HMC)
    record_keys = tuple(record_keys or kernel.state_keys)

    theta0s = jnp.asarray(theta0s)
    num_chains = theta0s.shape[0]
    keys = jax.random.split(key, num_chains)

    if jit:
        fn = _cached_jit(kernel, schedule, num_iters, num_burnin_iters, record_keys,
                         True, record_thin)
    else:
        fn = jax.vmap(run_fn(kernel, schedule, num_iters, num_burnin_iters, record_keys,
                             record_thin=record_thin))
    state, recorded = fn(keys, theta0s)

    if return_arrays:
        return (recorded, state) if return_state else recorded
    chains = ChainLists.from_arrays({k: np.asarray(v) for k, v in recorded.items()})
    return (chains, state) if return_state else chains
