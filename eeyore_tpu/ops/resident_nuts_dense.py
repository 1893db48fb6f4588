"""VMEM-resident fixed-budget NUTS in the dense chain-tile layout.

The whole-loop-in-one-Pallas-kernel scaffold of ops/resident_hmc_dense.py
applied to the fixed-budget No-U-Turn transition (samplers/nuts.py
``fixed_budget=True``): every transition executes exactly ``2^max_depth - 1``
leapfrogs as STATIC control flow, so the entire tree — doublings, subtree
leaves, checkpoint-stack U-turn checks — unrolls at build time into straight
tile code. Two things fall out of the full unroll that the scanned form
cannot have:

- the checkpoint stack is a PYTHON list of parameter-tile tuples with static
  indices (leaf ``n`` stores at slot ``popcount(n)`` when even, checks slots
  ``[popcount(n) - trailing_ones(n), popcount(n) - 1]`` when odd) — no
  dynamic indexing, no parked rows, no masked stores;
- per-chain adaptivity (which chains' subtrees turned/diverged, which end
  each chain doubles from, per-chain multinomial draws) is pure
  ``jnp.where`` masking on [8, lane_block] chain tiles — the same masked
  algebra the scanned fixed-budget form uses, with chains as lanes instead
  of a vmap axis.

Semantics match ``samplers/nuts.py`` ``_tree_fixed``/``_build_subtree_fixed``
(iterative multinomial NUTS, Betancourt-biased progressive merge, Stan-style
divergence threshold) level-for-level; the reference anchor those generalize
is the leapfrog/accept algebra of /root/reference/eeyore/samplers/hmc.py:
100-148. The kernel PRNG (ops/kernel_prng.py) replaces jax.random, so draws
are statistically equivalent but not bit-matched — validation is
moments/acceptance parity vs the scanned fixed-budget NUTS
(benchmarks/validate_dense_nuts.py).

Identity mass matrix (the scanned kernel's default); use the scanned
``mass_adapt`` path when a warmup metric is needed.
"""

import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal_tiles, uniform as _uniform
from eeyore_tpu.ops.mlp_dense import make_vg_dense, stack_chains, unstack_chains

DIVERGENCE_THRESHOLD = 1000.0


def _trailing_ones(n):
    count = 0
    while n & 1:
        count += 1
        n >>= 1
    return count


def make_resident_nuts_dense(model, x, y, step, max_depth, num_iters,
                             num_burnin_iters=0, chain_block=8192,
                             record_thin=1, tuner=None, unstack_outputs=True,
                             inv_mass=None, record_extras=False):
    """Build ``fn(seed, theta0s [C, P]) -> (samples [kept, C, P], final
    [C, P], accept_sums [C], divergent_sums [C])`` running the whole
    fixed-budget NUTS loop on-chip in the dense layout.

    ``accept_sums``/``divergent_sums`` accumulate the per-transition
    trajectory-mean Metropolis statistic / divergence flag over post-burnin
    iterations (divide by ``num_iters - num_burnin_iters`` for rates).

    ``max_depth`` is the FROZEN tree depth: 2^max_depth - 1 leapfrogs per
    transition, fully unrolled — keep it small (3-5; program size and
    compile time grow as 2^max_depth). Use samplers/nuts.py
    ``choose_max_depth`` warmup to pick it from data.

    ``tuner``: optional HMCDATuner for population dual-averaging of ONE
    shared step on the block-mean accept_stat during burn-in (construct
    WITHOUT a trajectory length — NUTS chooses its own).

    ``inv_mass``: optional FROZEN diagonal of M^-1 ([P] array) — the
    probe-and-freeze bridge for the scanned sampler's ``mass_adapt``
    warmup (samplers/nuts.py): momentum ~ N(0, M), kinetic/u-turn on
    velocities M^-1 r, positions move at step * M^-1 r. Static per-param
    constants, so the metric costs one fused multiply per tile op."""
    vg = make_vg_dense(model, x, y)
    P = model.num_params
    if inv_mass is None:
        im = None
    else:
        import numpy as _np
        im = [float(v) for v in _np.asarray(inv_mass).reshape(P)]
        if any(v <= 0.0 for v in im):
            raise ValueError("inv_mass must be positive")
        msc = [1.0 / math.sqrt(v) for v in im]  # momentum scale sqrt(M)
    if chain_block % 1024:
        raise ValueError(f"chain_block must be a multiple of 1024, got {chain_block}")
    D = int(max_depth)
    if D < 1:
        raise ValueError("max_depth must be >= 1")
    if tuner is not None and tuner.l is not None:
        raise ValueError("NUTS chooses its own trajectory length; construct "
                         "the tuner without l (HMCDATuner())")
    lane_block = chain_block // 8
    rows = P * 8
    # record_extras appends a val tile and a moved-flag tile to the stage
    rows_rec = (P + 2) * 8 if record_extras else rows
    kept = (num_iters - num_burnin_iters) // record_thin
    step = float(step)
    tile = (8, lane_block)
    NEG_INF = float("-inf")  # python float: a jnp scalar here would be a
    # captured traced constant, which pallas_call rejects (CLAUDE.md note)

    def u01(shape):
        # [0, 1): the multinomial/merge draws need log(u) < 0 to hold for
        # every u < 1 (first live leaf always taken), matching
        # jax.random.uniform's half-open range; ops/kernel_prng.uniform is
        # (0, 1] so flip it.
        return 1.0 - _uniform(shape)

    def logaddexp(a, b):
        # tile logaddexp with -inf guards: both -inf gives a-b = nan through
        # the naive form; guard on the max
        m = jnp.maximum(a, b)
        r = m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))
        return jnp.where(m == NEG_INF, m, r)

    def mdot(a_tiles, b_tiles):
        """sum_p inv_mass[p] * a[p] * b[p] — the metric inner product used
        for kinetic energy and (velocity-space) u-turn checks; identity
        metric folds to a plain dot."""
        def term(p):
            t = a_tiles[p] * b_tiles[p]
            return t if im is None or im[p] == 1.0 else jnp.float32(im[p]) * t
        acc = term(0)
        for p in range(1, P):
            acc = acc + term(p)
        return acc

    def vel(p, r):
        """velocity component M^-1 r (position update direction)."""
        return r if im is None or im[p] == 1.0 else jnp.float32(im[p]) * r

    def is_uturn(dtheta, r_left, r_right):
        return jnp.logical_or(mdot(dtheta, r_left) < 0.0,
                              mdot(dtheta, r_right) < 0.0)

    def kernel(seed_ref, theta_ref, samples_ref, final_ref, acc_ref, div_ref,
               stage_ref, dma_sem):
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)

        theta0 = tuple(theta_ref[p * 8:(p + 1) * 8, :] for p in range(P))
        val0, grad0 = vg(theta0)
        grad0 = tuple(grad0)
        zeros = jnp.zeros(tile, dtype=jnp.float32)
        acc0 = zeros
        div0 = zeros
        stage_ref[:, :] = jnp.zeros((rows_rec, lane_block), dtype=jnp.float32)

        if tuner is not None:
            tuner_m = jnp.float32(math.log(10.0 * step))

        def leapfrog(th, rho, g, step_s):
            rho = tuple(rho[p] + (0.5 * step_s) * g[p] for p in range(P))
            th = tuple(th[p] + step_s * vel(p, rho[p]) for p in range(P))
            v, g = vg(th)
            g = tuple(g)
            rho = tuple(rho[p] + (0.5 * step_s) * g[p] for p in range(P))
            return th, rho, v, g

        def build_subtree(depth, th, rho, g, logp0, step_s):
            """Static 2^depth leapfrogs from (th, rho) with per-chain masked
            early-stop algebra (samplers/nuts.py _build_subtree_fixed)."""
            target = zeros
            lse = jnp.full(tile, NEG_INF)
            prop_t, prop_v, prop_g = th, zeros, g
            sum_alpha = zeros
            num_alpha = zeros
            turning = jnp.zeros(tile, dtype=jnp.bool_)
            diverging = jnp.zeros(tile, dtype=jnp.bool_)
            ckpt = [None] * max(D - 1, 1)

            for n in range(2 ** depth):
                live = jnp.logical_not(turning | diverging)
                th, rho, target, g = leapfrog(th, rho, g, step_s)
                logp = target - 0.5 * mdot(rho, rho)
                w = logp - logp0
                leaf_div = jnp.logical_not(w > -DIVERGENCE_THRESHOLD)  # NaN too
                alpha = jnp.minimum(jnp.exp(w), 1.0)
                alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)

                w_eff = jnp.where(live, w, NEG_INF)
                new_lse = logaddexp(lse, w_eff)
                u = u01(tile)
                take = live & (jnp.log(u) < w_eff - new_lse)
                prop_t = tuple(jnp.where(take, th[p], prop_t[p]) for p in range(P))
                prop_v = jnp.where(take, target, prop_v)
                prop_g = tuple(jnp.where(take, g[p], prop_g[p]) for p in range(P))
                lse = new_lse

                pc = bin(n).count("1")
                if n % 2 == 0:
                    ckpt[pc] = (th, rho)
                else:
                    found = jnp.zeros(tile, dtype=jnp.bool_)
                    for i in range(pc - _trailing_ones(n), pc):
                        ck_t, ck_r = ckpt[i]
                        dtheta = tuple(th[p] - ck_t[p] for p in range(P))
                        found = found | is_uturn(dtheta, ck_r, rho)
                    turning = turning | (live & found)
                diverging = diverging | (live & leaf_div)
                sum_alpha = sum_alpha + jnp.where(live, alpha, 0.0)
                num_alpha = num_alpha + jnp.where(live, 1.0, 0.0)

            return {"theta": th, "rho": rho, "grad": g, "lse": lse,
                    "prop": (prop_t, prop_v, prop_g),
                    "sum_alpha": sum_alpha, "num_alpha": num_alpha,
                    "turning": turning, "diverging": diverging}

        def iteration(t, carry):
            theta, val, grad, acc, div, step_s, barh, logbare = carry
            theta_prev = theta

            mom = tuple(normal_tiles(P, tile))
            if im is not None:
                # rho ~ N(0, M): scale standard normals by sqrt(M) = msc
                mom = tuple(jnp.float32(msc[p]) * mom[p] if msc[p] != 1.0
                            else mom[p] for p in range(P))
            logp0 = val - 0.5 * mdot(mom, mom)

            th_l, r_l, g_l = theta, mom, grad
            th_r, r_r, g_r = theta, mom, grad
            prop_t, prop_v, prop_g = theta, val, grad
            lse = zeros                      # start state: weight exp(0)
            sum_alpha = zeros
            num_alpha = zeros
            turning = jnp.zeros(tile, dtype=jnp.bool_)
            diverging = jnp.zeros(tile, dtype=jnp.bool_)

            for depth in range(D):
                active = jnp.logical_not(turning | diverging)
                go_right = u01(tile) < 0.5
                v = jnp.where(go_right, 1.0, -1.0)

                end_t = tuple(jnp.where(go_right, th_r[p], th_l[p]) for p in range(P))
                end_r = tuple(jnp.where(go_right, r_r[p], r_l[p]) for p in range(P))
                end_g = tuple(jnp.where(go_right, g_r[p], g_l[p]) for p in range(P))

                sub = build_subtree(depth, end_t,
                                    tuple(v * end_r[p] for p in range(P)),
                                    end_g, logp0, step_s)

                bad = sub["turning"] | sub["diverging"]
                sum_alpha = sum_alpha + jnp.where(active, sub["sum_alpha"], 0.0)
                num_alpha = num_alpha + jnp.where(active, sub["num_alpha"], 0.0)

                # Betancourt-biased progressive merge
                accept_log_prob = jnp.minimum(sub["lse"] - lse, 0.0)
                u = u01(tile)
                take = active & jnp.logical_not(bad) & (jnp.log(u) < accept_log_prob)
                s_t, s_v, s_g = sub["prop"]
                prop_t = tuple(jnp.where(take, s_t[p], prop_t[p]) for p in range(P))
                prop_v = jnp.where(take, s_v, prop_v)
                prop_g = tuple(jnp.where(take, s_g[p], prop_g[p]) for p in range(P))
                ok = active & jnp.logical_not(bad)
                lse = jnp.where(ok, logaddexp(lse, sub["lse"]), lse)

                # install the new trajectory end (forward-time momentum v*rho)
                okr = ok & go_right
                okl = ok & jnp.logical_not(go_right)
                new_r = tuple(v * sub["rho"][p] for p in range(P))
                th_r = tuple(jnp.where(okr, sub["theta"][p], th_r[p]) for p in range(P))
                r_r = tuple(jnp.where(okr, new_r[p], r_r[p]) for p in range(P))
                g_r = tuple(jnp.where(okr, sub["grad"][p], g_r[p]) for p in range(P))
                th_l = tuple(jnp.where(okl, sub["theta"][p], th_l[p]) for p in range(P))
                r_l = tuple(jnp.where(okl, new_r[p], r_l[p]) for p in range(P))
                g_l = tuple(jnp.where(okl, sub["grad"][p], g_l[p]) for p in range(P))

                dtheta = tuple(th_r[p] - th_l[p] for p in range(P))
                whole_turn = ok & is_uturn(dtheta, r_l, r_r)
                turning = turning | (active & (bad | whole_turn))
                diverging = diverging | (active & sub["diverging"])

            theta, val, grad = prop_t, prop_v, prop_g
            accept_stat = sum_alpha / jnp.maximum(num_alpha, 1.0)
            post = jnp.where(t >= num_burnin_iters, 1.0, 0.0)
            acc = acc + post * accept_stat
            div = div + post * jnp.where(diverging, 1.0, 0.0)

            if tuner is not None:
                # population dual averaging (Hoffman-Gelman Alg 5) on the
                # block-mean trajectory accept_stat, frozen after burn-in —
                # the resident_hmc_dense 'population' mode
                it = (t + 1).astype(jnp.float32)
                d_w = 1.0 / (it + tuner.t0)
                e_w = jnp.exp(-tuner.k * jnp.log(it))
                rate_stat = jnp.mean(accept_stat)
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
                step_s = jnp.where(tune_now, new_step, step_s)

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

            return (theta, val, grad, acc, div, step_s, barh, logbare)

        theta, val, grad, acc, div, *_ = jax.lax.fori_loop(
            0, num_iters, iteration,
            (theta0, val0, grad0, acc0, div0, jnp.float32(step),
             jnp.float32(0.0), jnp.float32(0.0)))
        for p in range(P):
            final_ref[p * 8:(p + 1) * 8, :] = theta[p]
        acc_ref[:, :] = acc
        div_ref[:, :] = div

    def fn(seed, theta0s, dense_input=False):
        theta0s = jnp.asarray(theta0s, dtype=jnp.float32)
        if dense_input:
            if theta0s.shape[0] != P * 8:
                raise ValueError(f"dense_input=True needs [P*8={P * 8}, C/8] "
                                 f"tiles, got {theta0s.shape}")
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
            dense = stack_chains(theta0s)

        samples, final, acc, div = pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # samples stay in HBM
                pl.BlockSpec((rows, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, lane_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kept, rows_rec, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((rows, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((8, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((8, total_lanes), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_rec, lane_block), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(jnp.asarray([seed], jnp.int32), dense)

        if not unstack_outputs:
            return samples, final, acc, div
        if not record_extras:
            return (unstack_chains(samples, P),        # [kept, C, P]
                    unstack_chains(final, P),          # [C, P]
                    acc.reshape(-1),                   # [C]
                    div.reshape(-1))                   # [C]
        un = unstack_chains(samples, P + 2)            # [kept, C, P+2]
        return (un[..., :P], unstack_chains(final, P),
                acc.reshape(-1), div.reshape(-1),
                un[..., P], un[..., P + 1].astype(jnp.int32))

    return fn
