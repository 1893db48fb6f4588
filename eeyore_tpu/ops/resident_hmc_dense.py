"""VMEM-resident HMC in the dense chain-tile layout (small datasets).

Same whole-loop-in-one-Pallas-kernel structure as ops/resident_hmc.py — the
chain state never leaves VMEM; HBM is touched once per recorded sample — but
built on ops/mlp_dense.py: chains fill both sublanes AND lanes of every tile
(one [8, lane_block] tile per scalar parameter), the data loop is unrolled
with x/y folded in as constants, and parameter-space work (prior, leapfrog
updates, momentum draws, accept selects) runs at exact tile density. For
XOR-sized data this removes the half-empty sublane rows that bound the
data-on-sublanes kernel (see mlp_dense module docstring), and the momentum
draw needs ceil(P/2) Box-Muller pairs with at most one discarded half
instead of a 16-row tile for 9 parameter rows.

Reference semantics are identical to resident_hmc (HMC draw:
/root/reference/eeyore/samplers/hmc.py:126-170; in-kernel dual averaging =
hmcda_tuner.py:40-59 population variant).
"""

import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal_tiles, uniform as _uniform
from eeyore_tpu.ops.mlp_dense import make_vg_dense, stack_chains, unstack_chains


def make_resident_hmc_dense(model, x, y, step, num_steps, num_iters,
                            num_burnin_iters=0, chain_block=8192, record_thin=1,
                            tuner=None, max_num_steps=64, unstack_outputs=True,
                            tuner_mode="population", l_rounding="round",
                            record_extras=False):
    """Build ``fn(seed, theta0s [C, P]) -> (samples [kept, C, P], final [C, P],
    accept_counts [C])`` running the whole HMC loop on-chip in the dense
    layout. C must be a multiple of ``chain_block``; ``chain_block`` must be
    a multiple of 1024 (8 sublanes x 128 lanes).

    ``unstack_outputs=False`` skips the device-side transpose back to
    chain-major order and returns the raw dense tiles instead —
    ``(samples [kept, P*8, C/8], final [P*8, C/8], acc [8, C/8])``, chain id
    c = sublane*(C/8) + column; use ops.mlp_dense.unstack_chains to recover
    chain-major arrays host-side for the slices actually needed.

    ``tuner_mode``: 'population' dual-averages ONE step (and trajectory
    length via the tuner's l-rule) on the block-mean acceptance — uniform
    across the block, so leapfrog trip counts never diverge between lanes.
    'per_chain' gives every chain its own dual-averaged step tile driven by
    its own Metropolis statistic (the scanned kernel's semantics,
    samplers/hmc.py); when the tuner has a trajectory length ``l``, each
    chain also gets its own ``num_steps = clip(round(l/step), 1,
    max_num_steps)`` and the leapfrog loop runs to the BLOCK MAX with
    per-lane masking (finished lanes freeze: zero position/momentum
    increments, so the re-evaluated value/grad are unchanged). With
    ``l=None`` the trajectory stays FIXED at ``num_steps`` (the round-2
    behavior).

    ``l_rounding``: how the l-rule trajectory length is FROZEN at burn-in
    end (reference rule being stabilized: hmcda_tuner.py:55-58
    ``num_steps = max(1, round(l/e))``). 'round' (default) keeps the plain
    round — sitting on a half-integer cliff (l/e = 7.5) flips the whole
    block's trajectory length between seeds, the measured ~13% wall swing.
    'stochastic' freezes each CHAIN to floor or ceil of l/e with
    probability equal to the fractional part (mean trajectory exactly l,
    block wall = ceil, stable across seeds — validated for the sublane
    kernel in benchmarks/validate_dense_tuned.py, round 4)."""
    vg = make_vg_dense(model, x, y)
    P = model.num_params
    if tuner_mode not in ("population", "per_chain"):
        raise ValueError(f"unknown tuner_mode {tuner_mode!r}")
    if l_rounding not in ("round", "stochastic"):
        raise ValueError(f"l_rounding must be 'round' or 'stochastic', got "
                         f"{l_rounding!r}")
    per_chain = tuner is not None and tuner_mode == "per_chain"
    stoch_l = (tuner is not None and tuner.l is not None
               and l_rounding == "stochastic")
    if chain_block % 1024:
        raise ValueError(f"chain_block must be a multiple of 1024, got {chain_block}")
    lane_block = chain_block // 8
    rows = P * 8
    # record_extras appends a val tile and a moved-flag tile to the stage
    rows_rec = (P + 2) * 8 if record_extras else rows
    kept = (num_iters - num_burnin_iters) // record_thin
    step = float(step)
    tile = (8, lane_block)

    def kernel(seed_ref, theta_ref, samples_ref, final_ref, acc_ref,
               stage_ref, dma_sem):
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)

        theta0 = tuple(theta_ref[p * 8:(p + 1) * 8, :] for p in range(P))
        val0, grad0 = vg(theta0)
        acc0 = jnp.zeros(tile, dtype=jnp.float32)
        stage_ref[:, :] = jnp.zeros((rows_rec, lane_block), dtype=jnp.float32)

        per_chain_l = per_chain and tuner.l is not None
        lane_n = per_chain_l or stoch_l  # trip counts may diverge per lane
        if per_chain:
            step0 = jnp.full(tile, step, dtype=jnp.float32)
            barh0 = jnp.zeros(tile, dtype=jnp.float32)
            logbare0 = jnp.zeros(tile, dtype=jnp.float32)
        else:
            step0 = jnp.float32(step)
            barh0 = jnp.float32(0.0)
            logbare0 = jnp.float32(0.0)
        if lane_n:
            n_steps0 = jnp.full(tile, num_steps, dtype=jnp.int32)
        else:
            n_steps0 = jnp.int32(num_steps)
        tuner_m = jnp.float32(math.log(10.0 * step))

        def iteration(t, carry):
            theta, val, grad, acc, cur_step, cur_n_steps, barh, logbare = carry
            theta_prev = theta
            mom = normal_tiles(P, tile)
            ke = mom[0] * mom[0]
            for p in range(1, P):
                ke = ke + mom[p] * mom[p]
            h_cur = -val + 0.5 * ke

            p_half = tuple(mom[p] + (0.5 * cur_step) * grad[p] for p in range(P))

            if lane_n:
                # lane-divergent trajectories: run to the block max with
                # per-lane masking — finished lanes get zero increments, so
                # the (recomputed) value/grad stay at their trajectory end
                def lf_body(s, c):
                    th, pm, v, g = c
                    stepfac = jnp.where(s < cur_n_steps, cur_step, 0.0)
                    th = tuple(th[p] + stepfac * pm[p] for p in range(P))
                    v, g = vg(th)
                    pmfac = jnp.where(s == cur_n_steps - 1, 0.5, 1.0) * stepfac
                    pm = tuple(pm[p] + pmfac * g[p] for p in range(P))
                    return (th, pm, v, tuple(g))

                trip = jnp.max(cur_n_steps)
            else:
                def lf_body(s, c):
                    th, pm, v, g = c
                    th = tuple(th[p] + cur_step * pm[p] for p in range(P))
                    v, g = vg(th)
                    factor = jnp.where(s == cur_n_steps - 1, 0.5, 1.0)
                    pm = tuple(pm[p] + (factor * cur_step) * g[p] for p in range(P))
                    return (th, pm, v, tuple(g))

                trip = cur_n_steps

            th, pm, v, g = jax.lax.fori_loop(
                0, trip, lf_body, (theta, p_half, val, tuple(grad)))

            ke_p = pm[0] * pm[0]
            for p in range(1, P):
                ke_p = ke_p + pm[p] * pm[p]
            h_prop = -v + 0.5 * ke_p
            rates = jnp.minimum(jnp.exp(h_cur - h_prop), 1.0)
            u = _uniform(tile)
            accept = u < rates

            theta = tuple(jnp.where(accept, th[p], theta[p]) for p in range(P))
            val = jnp.where(accept, v, val)
            grad = tuple(jnp.where(accept, g[p], grad[p]) for p in range(P))
            acc = acc + jnp.where(t >= num_burnin_iters, 1.0, 0.0) * jnp.where(accept, 1.0, 0.0)

            if tuner is not None:
                # dual averaging (Hoffman-Gelman Alg 5), frozen after
                # burn-in: on the block-mean acceptance with one shared step
                # and the l-rule trajectory length ('population'), or per
                # chain on each lane's own Metropolis statistic with the
                # trajectory FIXED ('per_chain': no trip-count divergence)
                it = (t + 1).astype(jnp.float32)
                d_w = 1.0 / (it + tuner.t0)
                e_w = jnp.exp(-tuner.k * jnp.log(it))
                rate_stat = rates if per_chain else jnp.mean(rates)
                rate_stat = jnp.where(jnp.isnan(rate_stat), 0.0, rate_stat)
                new_barh = (1.0 - d_w) * barh + d_w * (tuner.d - rate_stat)
                loge = tuner_m - jnp.sqrt(it) * new_barh / tuner.g
                if tuner.eub is not None:
                    loge = jnp.minimum(loge, jnp.float32(math.log(tuner.eub)))
                new_logbare = e_w * loge + (1.0 - e_w) * logbare
                last_burnin = t == num_burnin_iters - 1
                new_step = jnp.where(last_burnin, jnp.exp(new_logbare), jnp.exp(loge))
                tune_now = t < num_burnin_iters
                barh = jnp.where(tune_now, new_barh, barh)
                logbare = jnp.where(tune_now, new_logbare, logbare)
                cur_step = jnp.where(tune_now, new_step, cur_step)
                if not per_chain or per_chain_l:
                    # the l-rule: scalar in 'population' mode, a per-lane
                    # tile in 'per_chain' mode (block-max bounded leapfrog)
                    ratio = tuner.l / new_step
                    rounded = jnp.clip(
                        jnp.round(ratio).astype(jnp.int32), 1, max_num_steps)
                    if stoch_l:
                        # freeze by per-chain stochastic rounding (docstring)
                        n_lo = jnp.floor(ratio)
                        frac = ratio - n_lo
                        u = _uniform(tile)
                        stoch_n = jnp.clip(
                            n_lo.astype(jnp.int32) + (u < frac).astype(jnp.int32),
                            1, max_num_steps)
                        new_n_steps = jnp.where(
                            last_burnin, stoch_n,
                            jnp.broadcast_to(rounded, tile))
                    else:
                        new_n_steps = rounded
                    cur_n_steps = jnp.where(tune_now, new_n_steps, cur_n_steps)

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

            return (theta, val, grad, acc, cur_step, cur_n_steps, barh, logbare)

        theta, val, grad, acc, *_ = jax.lax.fori_loop(
            0, num_iters, iteration,
            (theta0, val0, tuple(grad0), acc0, step0, n_steps0, barh0, logbare0))
        for p in range(P):
            final_ref[p * 8:(p + 1) * 8, :] = theta[p]
        acc_ref[:, :] = acc

    def fn(seed, theta0s, samples_buf=None, dense_input=None):
        """``samples_buf``: optional previous samples array of the exact
        output shape, aliased in place of a fresh HBM allocation (pallas
        input_output_aliases). MEASURED ~20% SLOWER than the plain dispatch
        at the 131072x256 bench shape (XLA materializes the
        alias-as-initial-contents copy of the 1.2GB output; bench.py notes)
        — kept only for experimentation on other shapes; the headline bench
        does NOT use it.

        ``theta0s``: [C, P] chain-major, or (with ``dense_input=True``) the
        raw [P*8, C/8] dense tiles so repeat callers can pre-stack once via
        ops.mlp_dense.stack_chains. With ``dense_input=None`` the layout is
        inferred from the shape; the ambiguous [P*8, P] case (C == 8*P
        chain-major input has the same shape as a dense tile stack) raises
        — pass the flag explicitly there."""
        theta0s = jnp.asarray(theta0s, dtype=jnp.float32)
        if dense_input is None:
            looks_dense = (theta0s.ndim == 2 and theta0s.shape[0] == P * 8
                           and theta0s.shape[1] != P)
            looks_chain_major = theta0s.ndim == 2 and theta0s.shape[1] == P
            if looks_chain_major and theta0s.shape[0] == P * 8:
                raise ValueError(
                    f"ambiguous theta0s shape {theta0s.shape}: [P*8, P] reads "
                    "as both chain-major and dense tiles — pass "
                    "dense_input=True/False explicitly")
            dense_input = looks_dense
        if dense_input:
            if theta0s.shape[0] != P * 8:
                raise ValueError(
                    f"dense_input=True needs [P*8={P * 8}, C/8] tiles, got "
                    f"{theta0s.shape}")
            dense = theta0s
            C = theta0s.shape[1] * 8
        else:
            C = theta0s.shape[0]
            dense = None
        if C % chain_block != 0:
            raise ValueError(f"{C} chains not a multiple of chain_block {chain_block}")
        num_blocks = C // chain_block
        total_lanes = C // 8
        if dense is None:
            dense = stack_chains(theta0s)          # [P*8, C/8]

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        args = [jnp.asarray([seed], jnp.int32), dense]
        io_aliases = {}
        if samples_buf is not None:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
            args.append(samples_buf)
            io_aliases = {2: 0}

        def kernel_wrap(*refs):
            if samples_buf is not None:
                seed_ref, theta_ref, _sbuf_ref, *rest = refs
            else:
                seed_ref, theta_ref, *rest = refs
            return kernel(seed_ref, theta_ref, *rest)

        samples, final, acc = pl.pallas_call(
            kernel_wrap,
            grid=(num_blocks,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # samples stay in HBM
                pl.BlockSpec((rows, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kept, rows_rec, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((rows, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((8, total_lanes), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_rec, lane_block), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            input_output_aliases=io_aliases,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(*args)

        if not unstack_outputs:
            return samples, final, acc
        if not record_extras:
            return (unstack_chains(samples, P),        # [kept, C, P]
                    unstack_chains(final, P),          # [C, P]
                    acc.reshape(-1))                   # [C]
        un = unstack_chains(samples, P + 2)            # [kept, C, P+2]
        return (un[..., :P], unstack_chains(final, P), acc.reshape(-1),
                un[..., P], un[..., P + 1].astype(jnp.int32))

    return fn
