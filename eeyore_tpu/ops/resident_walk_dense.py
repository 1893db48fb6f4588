"""VMEM-resident MH and MALA in the dense chain-tile layout (small datasets).

Same whole-loop structure as ops/resident_walk.py but built on
ops/mlp_dense.py: one [8, lane_block] tile per scalar parameter, chains on
both sublanes and lanes, data unrolled with x/y as constants. The walk
kernels profit even more than HMC from the dense layout because they are
proposal-PRNG-bound: a [P, C] Normal draw in the data-on-sublanes layout
transforms 16 sublane rows to use 9 (P=9), while P dense tiles waste at most
one Box-Muller half — and the accept uniforms fill all 8 sublanes instead
of one row in eight.

Semantics match the scanned kernels exactly (same algebra as resident_walk:
MALA asymmetric Hastings with cancelled Normal constants, reference
/root/reference/eeyore/samplers/mala.py:35-66; MH symmetric Normal walk,
metropolis_hastings.py:25-67).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal_tiles, uniform as _uniform
from eeyore_tpu.ops.mlp_dense import make_vg_dense, stack_chains, unstack_chains


def _make_resident_dense(model, x, y, num_iters, num_burnin_iters, chain_block,
                         record_thin, iteration_factory, with_grad,
                         acc_tiles=1, consts=(), record_extras=False):
    """Dense-layout scaffold: build fn(seed, theta0s [C, P]) ->
    (samples [kept, C, P], final [C, P], accept_counts [C] or [C, acc_tiles]).

    ``iteration_factory(vg, tile, const_vals) -> (state_init, move)`` with
    ``state_init(theta_tiles) -> (val, grad_tiles[, extra])`` and
    ``move(theta, val, grad, accs, extra, gate, t) -> (theta, val, grad,
    accs, extra)`` where theta/grad are tuples of P [8, lane_block] tiles,
    val is a single tile (one slot per chain), ``accs`` is a tuple of
    ``acc_tiles`` counter tiles and ``extra`` is an arbitrary pytree of
    fixed-shape arrays carried through the loop (tuner state; ``()`` if
    unused). ``consts`` is a tuple of [1, lane_block] float32 numpy arrays
    shipped as broadcast VMEM inputs (Pallas kernels cannot capture traced
    array constants); they must be block-periodic since every grid block
    sees the same values."""
    vg = make_vg_dense(model, x, y, with_grad=with_grad)
    P = model.num_params
    if chain_block % 1024:
        raise ValueError(f"chain_block must be a multiple of 1024, got {chain_block}")
    lane_block = chain_block // 8
    rows = P * 8
    # record_extras appends a val tile and a moved-flag tile to the record
    # stage (host sees them as two extra pseudo-parameters)
    rows_rec = (P + 2) * 8 if record_extras else rows
    kept = (num_iters - num_burnin_iters) // record_thin
    tile = (8, lane_block)
    consts = tuple(np.asarray(c, dtype=np.float32).reshape(1, lane_block)
                   for c in consts)

    def kernel(seed_ref, theta_ref, *rest):
        const_refs = rest[:len(consts)]
        samples_ref, final_ref, acc_ref, stage_ref, dma_sem = rest[len(consts):]
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)

        const_vals = tuple(r[:, :] for r in const_refs)
        state_init, move = iteration_factory(vg, tile, const_vals)

        theta0 = tuple(theta_ref[p * 8:(p + 1) * 8, :] for p in range(P))
        init_out = state_init(theta0)
        val0, grad0 = init_out[0], init_out[1]
        extra0 = init_out[2] if len(init_out) > 2 else ()
        accs0 = tuple(jnp.zeros(tile, dtype=jnp.float32) for _ in range(acc_tiles))
        stage_ref[:, :] = jnp.zeros((rows_rec, lane_block), dtype=jnp.float32)

        def iteration(t, carry):
            theta, val, grad, accs, extra = carry
            theta_prev = theta
            gate = jnp.where(t >= num_burnin_iters, 1.0, 0.0)
            theta, val, grad, accs, extra = move(theta, val, grad, accs, extra, gate, t)

            rec = jnp.logical_and(t >= num_burnin_iters,
                                  (t - num_burnin_iters) % record_thin == 0)

            @pl.when(rec)
            def _():
                for p in range(P):
                    stage_ref[p * 8:(p + 1) * 8, :] = theta[p]
                if record_extras:
                    stage_ref[P * 8:(P + 1) * 8, :] = val
                    moved = theta[0] != theta_prev[0]
                    for p in range(1, P):
                        moved = moved | (theta[p] != theta_prev[p])
                    stage_ref[(P + 1) * 8:(P + 2) * 8, :] = moved.astype(
                        jnp.float32)
                idx = (t - num_burnin_iters) // record_thin
                dma = pltpu.make_async_copy(
                    stage_ref,
                    samples_ref.at[idx, :, pl.ds(i_blk * lane_block, lane_block)],
                    dma_sem,
                )
                dma.start()
                dma.wait()

            return (theta, val, grad, accs, extra)

        theta, val, grad, accs, extra = jax.lax.fori_loop(
            0, num_iters, iteration, (theta0, val0, grad0, accs0, extra0))
        for p in range(P):
            final_ref[p * 8:(p + 1) * 8, :] = theta[p]
        for a in range(acc_tiles):
            acc_ref[a * 8:(a + 1) * 8, :] = accs[a]

    def fn(seed, theta0s):
        theta0s = jnp.asarray(theta0s, dtype=jnp.float32)
        C = theta0s.shape[0]
        if C % chain_block != 0:
            raise ValueError(f"{C} chains not a multiple of chain_block {chain_block}")
        num_blocks = C // chain_block
        total_lanes = C // 8
        dense = stack_chains(theta0s)

        samples, final, acc = pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, lane_block), lambda i: (0, 0), memory_space=pltpu.VMEM)
                for _ in consts
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((rows, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((acc_tiles * 8, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kept, rows_rec, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((rows, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((acc_tiles * 8, total_lanes), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_rec, lane_block), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(jnp.asarray([seed], jnp.int32), dense, *[jnp.asarray(c) for c in consts])

        acc_out = (acc.reshape(-1) if acc_tiles == 1
                   else acc.reshape(acc_tiles, 8 * total_lanes).T)  # [C, acc_tiles]
        if not record_extras:
            return (unstack_chains(samples, P),
                    unstack_chains(final, P),
                    acc_out)
        un = unstack_chains(samples, P + 2)   # [kept, C, P+2]
        return (un[..., :P], unstack_chains(final, P), acc_out,
                un[..., P], un[..., P + 1].astype(jnp.int32))

    return fn


def _tuner_init(tuner, value):
    """In-kernel population dual-averaging carry (Hoffman-Gelman Alg 5 on
    the block-mean acceptance; the same scheme resident_hmc runs):
    (barh, logbare, current tuned value)."""
    return (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(value))


def _population_dual_average(tuner, m_const, extra, mean_rate, t, num_burnin_iters):
    """One dual-averaging update of the tuned scalar; instantaneous value
    during burn-in, frozen at the averaged value on the last burn-in
    iteration, untouched after."""
    barh, logbare, cur = extra
    it = (t + 1).astype(jnp.float32)
    d_w = 1.0 / (it + tuner.t0)
    e_w = jnp.exp(-tuner.k * jnp.log(it))  # it**-k (Mosaic has no powf)
    new_barh = (1.0 - d_w) * barh + d_w * (tuner.d - mean_rate)
    loge = m_const - jnp.sqrt(it) * new_barh / tuner.g
    if tuner.eub is not None:
        loge = jnp.minimum(loge, jnp.float32(math.log(tuner.eub)))
    new_logbare = e_w * loge + (1.0 - e_w) * logbare
    last_burnin = t == num_burnin_iters - 1
    new_cur = jnp.where(last_burnin, jnp.exp(new_logbare), jnp.exp(loge))
    tune_now = t < num_burnin_iters
    return (jnp.where(tune_now, new_barh, barh),
            jnp.where(tune_now, new_logbare, logbare),
            jnp.where(tune_now, new_cur, cur))


def make_resident_mh_dense(model, x, y, scale, num_iters, num_burnin_iters=0,
                           chain_block=8192, record_thin=1, tuner=None,
                           record_extras=False):
    """Whole-loop random-walk MH, dense layout: symmetric iid-Normal
    proposal, value-only forward (no backward pass).

    With a ``tuner`` (HMCDATuner config; pick ``d`` = target acceptance,
    0.234 is the classic random-walk optimum), the proposal SCALE is
    dual-averaged in-kernel on the block-mean acceptance during burn-in and
    frozen at the averaged value after (the scheme resident_hmc uses for
    the step size)."""
    scale = float(scale)

    def factory(v, tile, _consts):
        m_const = jnp.float32(math.log(10.0 * scale))

        def state_init(theta0):
            return v(theta0), (), _tuner_init(tuner, scale) if tuner else ()

        def move(theta, val, grad, accs, extra, gate, t):
            P = len(theta)
            cur_scale = extra[2] if tuner else jnp.float32(scale)
            z = normal_tiles(P, tile)
            prop = tuple(theta[p] + cur_scale * z[p] for p in range(P))
            v_p = v(prop)
            log_rate = v_p - val
            u = _uniform(tile)
            accept = jnp.log(u) < log_rate
            theta = tuple(jnp.where(accept, prop[p], theta[p]) for p in range(P))
            val = jnp.where(accept, v_p, val)
            if tuner is not None:
                rates = jnp.minimum(jnp.exp(jnp.minimum(log_rate, 0.0)), 1.0)
                extra = _population_dual_average(
                    tuner, m_const, extra, jnp.mean(rates), t, num_burnin_iters)
            return (theta, val, grad,
                    (accs[0] + gate * jnp.where(accept, 1.0, 0.0),), extra)

        return state_init, move

    return _make_resident_dense(model, x, y, num_iters, num_burnin_iters,
                                chain_block, record_thin, factory,
                                with_grad=False, record_extras=record_extras)


def make_resident_gibbs_dense(model, x, y, scales=1.0, node_subblock_size=None,
                              num_iters=1000, num_burnin_iters=0,
                              chain_block=8192, record_thin=1,
                              record_extras=False):
    """Whole-loop blocked Metropolis-within-Gibbs, dense layout (reference
    gibbs.py:73-96 semantics; same sweep/accept structure as
    resident_walk.make_resident_gibbs).

    Dense wins twice here: a sub-block proposal perturbs ONLY its
    coordinates' parameter tiles (the sublane kernel draws and masks a full
    [P, C] normal per sub-block), and the incremental evaluation
    (ops/mlp_dense.py::make_incremental_gibbs_dense) recomputes just the
    touched unit plus layers strictly downstream from a VMEM tile cache —
    bit-identical to the full forward (tests/test_mlp_dense.py). Returns
    per-chain PER-SUB-BLOCK acceptance counts [C, num_sub_blocks]; rejected
    coordinates are restored before the next sub-block proposal (fixing the
    reference's rejected-coordinate leak — samplers/gibbs.py docstring)."""
    from eeyore_tpu.ops.mlp_dense import make_incremental_gibbs_dense
    from eeyore_tpu.samplers.gibbs import Gibbs

    blocking = Gibbs(model, scales=scales, node_subblock_size=node_subblock_size)
    B = blocking.num_sub_blocks
    # per sub-block: (param indices, scale, (layer, node) of the unit touched)
    sub_info = []
    b = 0
    for block, subs in enumerate(blocking.get_blocks()):
        unit = model.layer_and_node_from_par_block(block)
        for sub in subs:
            sub_info.append((tuple(int(i) for i in sub),
                             float(blocking._sub_blocks[b][1]), unit))
            b += 1
    assert len(sub_info) == B

    _, inc_init, inc_updates = make_incremental_gibbs_dense(model, x, y)

    def factory(_v, tile, _consts):
        def state_init(theta0):
            val0, cache0 = inc_init(theta0)
            return val0, (), cache0  # the activation cache rides in `extra`

        def move(theta, val, grad, accs, cache, gate, t):
            accs = list(accs)
            for s, (idxs, scale, unit) in enumerate(sub_info):
                z = normal_tiles(len(idxs), tile)
                prop = list(theta)
                for k, p in enumerate(idxs):
                    prop[p] = theta[p] + scale * z[k]
                prop = tuple(prop)
                v_p, cache_p = inc_updates[unit](prop, cache)
                u = _uniform(tile)
                accept = jnp.log(u) < v_p - val
                idx_set = set(idxs)
                theta = tuple(jnp.where(accept, prop[p], theta[p])
                              if p in idx_set else theta[p]
                              for p in range(len(theta)))
                val = jnp.where(accept, v_p, val)
                cache = tuple(old if new is old else jnp.where(accept, new, old)
                              for old, new in zip(cache, cache_p))
                accs[s] = accs[s] + gate * jnp.where(accept, 1.0, 0.0)
            return theta, val, grad, tuple(accs), cache

        return state_init, move

    return _make_resident_dense(model, x, y, num_iters, num_burnin_iters,
                                chain_block, record_thin, factory,
                                with_grad=False, acc_tiles=B,
                                record_extras=record_extras)


def make_resident_mala_dense(model, x, y, step, num_iters, num_burnin_iters=0,
                             chain_block=8192, record_thin=1, tuner=None,
                             record_extras=False):
    """Whole-loop MALA, dense layout: one fused value-and-grad per iteration
    with the full asymmetric Hastings correction (cancelled Normal constants,
    as in resident_walk.make_resident_mala).

    With a ``tuner`` (HMCDATuner config; ``d``=0.574 is the classic MALA
    optimum), the Langevin step is dual-averaged in-kernel on the block-mean
    acceptance during burn-in and frozen at the averaged value after."""
    step = float(step)

    def factory(vg, tile, _consts):
        m_const = jnp.float32(math.log(10.0 * step))

        def state_init(theta0):
            val0, grad0 = vg(theta0)
            return val0, tuple(grad0), _tuner_init(tuner, step) if tuner else ()

        def move(theta, val, grad, accs, extra, gate, t):
            P = len(theta)
            cur = extra[2] if tuner else jnp.float32(step)
            sqrt_cur = jnp.sqrt(cur) if tuner else jnp.float32(math.sqrt(step))
            z = normal_tiles(P, tile)
            prop = tuple(theta[p] + (0.5 * cur) * grad[p] + sqrt_cur * z[p]
                         for p in range(P))
            v_p, g_p = vg(prop)
            # ||theta - (prop + 0.5*step*g_p)||^2 accumulated per tile;
            # ||prop - fwd_mean||^2 = step * sum(z^2)
            d0 = theta[0] - (prop[0] + (0.5 * cur) * g_p[0])
            rev_sq = d0 * d0
            z_sq = z[0] * z[0]
            for p in range(1, P):
                dp = theta[p] - (prop[p] + (0.5 * cur) * g_p[p])
                rev_sq = rev_sq + dp * dp
                z_sq = z_sq + z[p] * z[p]
            log_rate = v_p - val - (0.5 / cur) * rev_sq + 0.5 * z_sq
            u = _uniform(tile)
            accept = jnp.log(u) < log_rate
            theta = tuple(jnp.where(accept, prop[p], theta[p]) for p in range(P))
            val = jnp.where(accept, v_p, val)
            grad = tuple(jnp.where(accept, g_p[p], grad[p]) for p in range(P))
            if tuner is not None:
                rates = jnp.minimum(jnp.exp(jnp.minimum(log_rate, 0.0)), 1.0)
                extra = _population_dual_average(
                    tuner, m_const, extra, jnp.mean(rates), t, num_burnin_iters)
            return (theta, val, grad,
                    (accs[0] + gate * jnp.where(accept, 1.0, 0.0),), extra)

        return state_init, move

    return _make_resident_dense(model, x, y, num_iters, num_burnin_iters,
                                chain_block, record_thin, factory,
                                with_grad=True, record_extras=record_extras)
