"""Multi-chip execution: chain sharding, sharded tempering ladders, and
sharded SMC with collective resampling.

Three tiers, all expressed with jax.sharding + shard_map over a Mesh (XLA
inserts the collectives; there is no hand-written transport):

1. ``sample_chains_sharded`` — independent chains sharded over the mesh's
   chain axis: pure data parallelism, zero collectives in the hot loop.
2. ``run_power_posterior_sharded`` — the tempering ladder sharded over a mesh
   axis; within-chain moves are local, even/odd swap rounds exchange edge
   rungs with ``lax.ppermute`` (the TPU-native form of the reference's
   between-chain swaps, power_posterior_sampler.py:157-169).
3. ``run_smc_sharded`` — particles sharded; weight normalization / ESS via
   psum-style global logsumexp and systematic resampling over the global
   weight vector (all_gather of weights + gathered particle rows).
"""

import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from eeyore_tpu.datasets import as_schedule
from eeyore_tpu.samplers.runner import run_fn


# ----------------------------------------------------------------------
# 1. chain-axis data parallelism
# ----------------------------------------------------------------------

def sample_chains_sharded(kernel, key, theta0s, data, num_iters, num_burnin_iters=0,
                          mesh=None, axis_name="chains", record_keys=None,
                          donate=False):
    """Like samplers.sample_chains, but with (key, theta0) sharded over the
    mesh's chain axis. Returns the raw recorded arrays (leaves
    [num_chains, kept, ...], sharded on the chain axis) and final states.

    Chains are independent, so XLA partitions the whole scanned program with
    no communication — scaling is linear up to per-chip occupancy.
    """
    from eeyore_tpu.parallel.mesh import chain_mesh

    mesh = mesh or chain_mesh(axis_name=axis_name)
    schedule = as_schedule(data)
    kernel.recompute_current = schedule.num_batches != 1
    if hasattr(kernel, "num_burnin_iters"):
        kernel.num_burnin_iters = num_burnin_iters
    record_keys = tuple(record_keys or kernel.state_keys)

    theta0s = jnp.asarray(theta0s)
    num_chains = theta0s.shape[0]
    keys = jax.random.split(key, num_chains)

    sharding = NamedSharding(mesh, P(axis_name))
    theta0s = jax.device_put(theta0s, sharding)
    keys = jax.device_put(keys, sharding)

    fn = jax.vmap(run_fn(kernel, schedule, num_iters, num_burnin_iters, record_keys))
    jfn = jax.jit(fn, donate_argnums=(0, 1) if donate else ())
    state, recorded = jfn(keys, theta0s)
    return recorded, state


def run_resident_hmc_sharded(model, x, y, key_seed, theta0s, step, num_steps,
                             num_iters, num_burnin_iters=0, chain_block=2048,
                             mesh=None, axis_name="chains", dense=False):
    """The VMEM-resident whole-loop HMC kernel (ops/resident_hmc.py, or the
    dense chain-tile variant ops/resident_hmc_dense.py with ``dense=True``
    — the fast path for sub-8-row datasets) sharded over the mesh's chain
    axis: each device runs the Pallas kernel on its local chain chunk
    (chains are independent — zero collectives).

    Returns (samples [kept, C, P], final [C, P], accept_counts [C]), sharded
    on the chain axis.
    """
    from eeyore_tpu.ops.resident_hmc import make_resident_hmc
    from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense
    from eeyore_tpu.parallel.mesh import chain_mesh

    mesh = mesh or chain_mesh(axis_name=axis_name)
    n_shards = mesh.shape[axis_name]
    theta0s = jnp.asarray(theta0s)
    C = theta0s.shape[0]
    if C % (n_shards * chain_block) != 0:
        raise ValueError(f"{C} chains must divide over {n_shards} shards of "
                         f"chain_block {chain_block}")

    maker = make_resident_hmc_dense if dense else make_resident_hmc
    fn = maker(model, x, y, step=step, num_steps=num_steps,
               num_iters=num_iters, num_burnin_iters=num_burnin_iters,
               chain_block=chain_block)

    def shard_body(theta_block):
        dev = jax.lax.axis_index(axis_name)
        return fn(key_seed + dev * 7919, theta_block)

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis_name),),
        out_specs=(P(None, axis_name), P(axis_name), P(axis_name)),
        # pallas_call outputs carry no vma annotation; chains are independent
        # so the varying-axis check adds nothing here
        check_vma=False,
    )
    return jax.jit(sharded)(theta0s)


def run_resident_tempering_sharded(model, x, y, key_seed, theta0s, num_rungs,
                                   step, sampler="MALA", temperatures=None,
                                   between_step=10, num_iters=1000,
                                   num_burnin_iters=0, chain_block=2048,
                                   mesh=None, axis_name="chains", dense=False):
    """The VMEM-resident parallel-tempering kernel (ops/resident_tempering.py,
    or the dense chain-tile variant with ``dense=True``) sharded over the
    mesh's chain axis. Temperature ladders live entirely inside one kernel
    block (swaps are lane shuffles), so sharding the lane axis across devices
    splits WHOLE ladders — zero collectives, linear weak scaling; the
    population scales by adding ladders, not rungs.

    ``theta0s`` is [C, P] with C = num_ladders * num_rungs lanes,
    ladder-major. Returns (samples [kept, C, P], final [C, P], counts [C, 2]),
    sharded on the chain axis.
    """
    from eeyore_tpu.ops.resident_tempering import make_resident_tempering
    from eeyore_tpu.ops.resident_tempering_dense import make_resident_tempering_dense
    from eeyore_tpu.parallel.mesh import chain_mesh

    mesh = mesh or chain_mesh(axis_name=axis_name)
    n_shards = mesh.shape[axis_name]
    theta0s = jnp.asarray(theta0s)
    C = theta0s.shape[0]
    if C % (n_shards * chain_block) != 0:
        raise ValueError(f"{C} lanes must divide over {n_shards} shards of "
                         f"chain_block {chain_block}")

    maker = make_resident_tempering_dense if dense else make_resident_tempering
    fn = maker(
        model, x, y, num_rungs=num_rungs, step=step, sampler=sampler,
        temperatures=temperatures, between_step=between_step,
        num_iters=num_iters, num_burnin_iters=num_burnin_iters,
        chain_block=chain_block)

    def shard_body(theta_block):
        dev = jax.lax.axis_index(axis_name)
        return fn(key_seed + dev * 7919, theta_block)

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis_name),),
        out_specs=(P(None, axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return jax.jit(sharded)(theta0s)


# ----------------------------------------------------------------------
# collective helpers
# ----------------------------------------------------------------------

def _vary(tree, axis_name):
    """Mark leaves as device-varying over ``axis_name`` (scan VMA check);
    leaves already varying pass through."""
    return jax.tree_util.tree_map(
        lambda l: l if axis_name in jax.typeof(l).vma
        else jax.lax.pcast(l, (axis_name,), to="varying"),
        tree,
    )


def global_logsumexp(x, axis_name):
    """logsumexp over both the local axis and a mesh axis."""
    m_local = jnp.max(x)
    m = jax.lax.pmax(m_local, axis_name)
    s = jax.lax.psum(jnp.sum(jnp.exp(x - m)), axis_name)
    return jnp.log(s) + m


def global_log_ess(log_w, axis_name):
    return 2.0 * global_logsumexp(log_w, axis_name) - global_logsumexp(2.0 * log_w, axis_name)


# ----------------------------------------------------------------------
# 2. sharded power-posterior ladder (even/odd swaps via ppermute)
# ----------------------------------------------------------------------

def run_power_posterior_sharded(pp, key, theta0, data, num_iters, num_burnin_iters=0,
                                mesh=None, axis_name="temp"):
    """Run a PowerPosteriorSampler with the temperature ladder sharded over
    ``axis_name``. Swap rounds use even/odd pairing; each shard exchanges its
    edge rungs with its neighbours via ``lax.ppermute``.

    Returns recorded arrays {key: [num_chains, kept_iters, ...]} (chain-major,
    coldest chain last, matching pp.run's layout).
    """
    from eeyore_tpu.parallel.mesh import chain_mesh

    mesh = mesh or chain_mesh(axis_name=axis_name)
    n_shards = mesh.shape[axis_name]
    N = pp.num_chains
    if N % n_shards != 0:
        raise ValueError(f"num_chains {N} must divide over {n_shards} shards")
    L = N // n_shards

    schedule = as_schedule(data)
    pp.recompute_current = schedule.num_batches != 1
    x0, y0 = schedule.batch(0)

    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (N,) + theta0.shape)
    temps = pp.temperatures.astype(theta0.dtype)
    record_keys = tuple(pp.state_keys)

    def shard_body(theta_block, temps_block):
        """Runs on one shard: theta_block [L, p], temps_block [L]."""
        dev = jax.lax.axis_index(axis_name)

        def init_one(theta, temp):
            return pp._make_kernel(temp).init(theta, x0, y0)

        inner = jax.vmap(init_one)(theta_block, temps_block)
        # leaves derived only from replicated inputs start scan-invariant
        inner = _vary(inner, axis_name)

        def within(k, inner, i, xb, yb):
            keys = jax.random.split(k, L)

            def move(kk, sub, temp):
                return pp._make_kernel(temp).step(kk, sub, xb, yb, i)[0]

            return jax.vmap(move)(keys, inner, temps_block)

        def swap_round(k, inner, i, xb, yb):
            """Even/odd adjacent-pair swaps across the global ladder."""
            parity = (i // pp.between_step) % 2
            gidx = dev * L + jnp.arange(L)  # global rung ids of this shard

            # Neighbour edge rungs via ppermute: left_ghost = left nbr's last
            # rung, right_ghost = right nbr's first rung.
            def edge(leaf_row, perm):
                return jax.lax.ppermute(leaf_row, axis_name, perm)

            right_perm = [(d, (d + 1) % n_shards) for d in range(n_shards)]
            left_perm = [(d, (d - 1) % n_shards) for d in range(n_shards)]
            last_row = jax.tree_util.tree_map(lambda l: l[-1], inner)
            first_row = jax.tree_util.tree_map(lambda l: l[0], inner)
            left_ghost = jax.tree_util.tree_map(lambda l: edge(l, right_perm), last_row)
            right_ghost = jax.tree_util.tree_map(lambda l: edge(l, left_perm), first_row)

            # extended arrays: [L+2, ...] = [left_ghost, block, right_ghost]
            ext = jax.tree_util.tree_map(
                lambda lg, blk, rg: jnp.concatenate([lg[None], blk, rg[None]], axis=0),
                left_ghost, inner, right_ghost,
            )

            base_ext = jax.vmap(lambda t: pp.model.log_target(t, xb, yb))(ext.sample)
            # global temperature of every ext row (ladder is contiguous)
            temp_of = lambda g: pp.temperatures.astype(theta0.dtype)[jnp.clip(g, 0, N - 1)]
            ext_gidx = jnp.concatenate([gidx[:1] - 1, gidx, gidx[-1:] + 1])
            ext_temps = temp_of(ext_gidx)

            is_lower = (gidx % 2) == parity
            partner_g = jnp.where(is_lower, gidx + 1, gidx - 1)
            valid = (partner_g >= 0) & (partner_g < N)
            # partner's position inside ext: local_idx + 1 +/- 1
            lidx = jnp.arange(L) + 1
            pidx = jnp.where(is_lower, lidx + 1, lidx - 1)

            my_base = base_ext[lidx]
            partner_base = base_ext[pidx]
            my_temp = temps_block
            partner_temp = ext_temps[pidx]
            my_target = ext.target_val[lidx]
            partner_target = ext.target_val[pidx]

            log_rate = (-my_target - partner_target
                        + my_temp * partner_base + partner_temp * my_base)
            pair_id = jnp.minimum(gidx, partner_g)
            u = jax.vmap(lambda pid: jax.random.uniform(
                jax.random.fold_in(k, pid), dtype=theta0.dtype))(pair_id)
            accept = valid & (jnp.log(u) < log_rate)

            new_sample = jnp.where(accept[:, None], ext.sample[pidx], inner.sample)
            new_target = jnp.where(accept, my_temp * partner_base, inner.target_val)
            repl = {"sample": new_sample, "target_val": new_target}
            if pp._has_grad:
                grad_ext = jax.vmap(lambda t: jax.grad(pp.model.log_target)(t, xb, yb))(ext.sample)
                repl["grad_val"] = jnp.where(accept[:, None],
                                             my_temp[:, None] * grad_ext[pidx],
                                             inner.grad_val)
            return inner._replace(**repl)

        def step(inner, i):
            k = jax.random.fold_in(key, i)
            k_w, k_s = jax.random.split(k)
            xb, yb = schedule.batch(i)
            inner = within(k_w, inner, i, xb, yb)
            inner = jax.lax.cond(
                (i % pp.between_step) == 0,
                lambda inn: swap_round(k_s, inn, i, xb, yb),
                lambda inn: inn,
                inner,
            )
            return inner, None

        inner, _ = jax.lax.scan(step, inner, jnp.arange(num_burnin_iters))

        def step_rec(inner, i):
            inner, _ = step(inner, i)
            return inner, {kk: getattr(inner, kk) for kk in record_keys}

        inner, recorded = jax.lax.scan(step_rec, inner, jnp.arange(num_burnin_iters, num_iters))
        return recorded

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=jax.tree_util.tree_map(lambda _: P(None, axis_name), {k: 0 for k in record_keys}),
    )
    recorded = jax.jit(sharded)(theta0, temps)
    # [kept, N, ...] -> chain-major [N, kept, ...]
    return {k: jnp.moveaxis(v, 0, 1) for k, v in recorded.items()}


# ----------------------------------------------------------------------
# 3. sharded SMC
# ----------------------------------------------------------------------

def run_smc_sharded(smc, key, data, mesh=None, axis_name="particles"):
    """Run an SMCSampler with the particle axis sharded over the mesh.

    Weight normalization and ESS are psum-reductions; systematic resampling
    gathers the global weight vector (small: one scalar per particle),
    computes global assignment indices, and gathers particle rows.
    Returns (particles [N, p], log_weights [N], diagnostics).
    """
    from eeyore_tpu.parallel.mesh import chain_mesh

    mesh = mesh or chain_mesh(axis_name=axis_name)
    n_shards = mesh.shape[axis_name]
    N = smc.num_particles
    if N % n_shards != 0:
        raise ValueError(f"num_particles {N} must divide over {n_shards} shards")
    Np = N // n_shards

    x, y = jnp.asarray(data[0]), jnp.asarray(data[1])
    betas = smc.betas

    def shard_body(key_shard):
        dev = jax.lax.axis_index(axis_name)
        key_local = jax.random.fold_in(key_shard[0], dev)

        key_init, key_stages = jax.random.split(key_local)
        if smc._is_bayesian:
            keys = jax.random.split(key_init, Np)
            particles = jax.vmap(smc.model.prior.sample)(keys)
        else:
            particles = smc.init_sampler(key_init, Np)
        log_w = jnp.zeros(Np, dtype=particles.dtype)
        log_z = jnp.zeros((), dtype=particles.dtype)

        def stage(carry, inputs):
            particles, log_w, log_z, key = carry
            beta_prev, beta = inputs
            key, key_res, key_mut = jax.random.split(key, 3)

            pots = jax.vmap(lambda t: smc._potential(t, x, y))(particles)
            incr = (beta - beta_prev) * pots
            log_norm_prev = log_w - global_logsumexp(log_w, axis_name)
            log_z = log_z + global_logsumexp(log_norm_prev + incr, axis_name)
            log_w = log_w + incr

            ess = jnp.exp(global_log_ess(log_w, axis_name))
            do_resample = ess < smc.ess_threshold * N

            # global systematic resample: gather all weights, slice my block
            all_log_w = jax.lax.all_gather(log_w, axis_name, tiled=True)  # [N]
            all_particles = jax.lax.all_gather(particles, axis_name, tiled=True)  # [N, p]
            norm_w = jax.nn.softmax(all_log_w)
            # identical key on every shard -> identical global index vector
            u = jax.random.uniform(key_res, dtype=norm_w.dtype)
            positions = (u + jnp.arange(N, dtype=norm_w.dtype)) / N
            cdf = jnp.cumsum(norm_w)
            idx = jnp.searchsorted(cdf / cdf[-1], positions, side="left")
            my_idx = jax.lax.dynamic_slice_in_dim(idx, dev * Np, Np)
            resampled = all_particles[my_idx]

            particles = jnp.where(do_resample, resampled, particles)
            log_w = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)

            particles, acc = smc._mutate(key_mut, particles, beta, x, y)
            out = {"ess": ess, "resampled": do_resample,
                   "mutation_acceptance": jax.lax.pmean(jnp.mean(acc), axis_name)}
            return (particles, log_w, log_z, key), out

        pairs = (betas[:-1], betas[1:])
        # particles/log_w are per-shard (varying); log_z and the key remain
        # replicated (their updates flow through psum-style reductions)
        carry0 = (_vary(particles, axis_name), _vary(log_w, axis_name), log_z, key_stages)
        (particles, log_w, log_z, _), diags = jax.lax.scan(stage, carry0, pairs)
        return particles, log_w, log_z, diags

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(None),),
        out_specs=(P(axis_name), P(axis_name), P(), {
            "ess": P(), "resampled": P(), "mutation_acceptance": P()}),
    )
    keys = jnp.broadcast_to(key, (1,) + key.shape) if key.ndim == 1 else key
    particles, log_w, log_z, diags = jax.jit(sharded)(keys)
    diagnostics = {k: jax.device_get(v) for k, v in diags.items()}
    diagnostics["log_evidence"] = float(log_z)
    return particles, log_w, diagnostics
