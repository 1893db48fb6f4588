"""VMEM-resident HMC: the ENTIRE sampling loop in one Pallas kernel.

The scanned XLA pipeline (samplers/runner.py) streams every per-iteration
tensor through HBM; at mlp221 scale that makes HMC HBM-bound (~100 small
[C]-sized arrays per iteration). This kernel instead keeps the whole chain
state — theta, momentum, gradient, every activation — in VMEM for the
entire run and touches HBM exactly once per recorded sample (an async DMA of
the [P, chain_block] sample tile). That is the SURVEY.md section 2.0 target:
"fusing the whole forward+backward+prior per chain into one kernel over the
vmapped chain axis, keeping theta in registers/VMEM across leapfrog steps".

Randomness: the on-core PRNG (pltpu.prng_*), seeded per chain block;
normals via Box-Muller. Streams differ from jax.random — statistically
equivalent, not bit-matched (validated by posterior-moment tests).
"""

import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal as _normal, uniform as _uniform
from eeyore_tpu.ops.mlp_math import extract_arch, make_vg, make_vg_stream, prepare_data

# row count past which the row-streaming vg schedule (chunked forward+
# backward, O(P) live tiles) replaces the materialize-everything schedule,
# whose ~O(n_pad) live [n_pad, C] buffers spill out of VMEM on iris-sized
# data (benchmarks/PROBE_IRIS.json)
STREAM_MIN_ROWS = 32


def make_resident_hmc(model, x, y, step, num_steps, num_iters, num_burnin_iters=0,
                      chain_block=2048, record_thin=1, tuner=None, max_num_steps=64,
                      stream=None, vmem_limit_bytes=None, mxu_layer0=None,
                      matmul_precision=None, l_rounding="round",
                      record_extras=False):
    """Build ``fn(seed, theta0s [C, P]) -> (samples [kept, C, P], final [C, P],
    accept_counts [C])`` running the whole HMC loop on-chip.

    ``kept = (num_iters - num_burnin_iters) // record_thin``. C must be a
    multiple of ``chain_block`` (which should be a multiple of 128).

    With a ``tuner`` (HMCDATuner config), dual averaging runs INSIDE the
    kernel during burn-in, driven by the population-mean acceptance of each
    chain block (the scalar step and trajectory length stay uniform across
    the block, so the leapfrog trip count never diverges between lanes);
    the last burn-in iteration freezes the averaged step, exactly as the
    reference's tuner hand-off (hmc.py:158-163).

    ``l_rounding``: how the l-rule trajectory length is FROZEN at burn-in
    end. "round" (default) is the reference's ``round(l/step)`` — but when
    ``l/step`` lands near a half-integer, seed-to-seed tuning noise flips
    the frozen count (7 vs 8 moved the iris config's throughput ~13%,
    RESULTS.md). "stochastic" freezes per-chain counts by STOCHASTIC
    rounding, ``floor(l/e) + Bernoulli(frac(l/e))``: the mean trajectory
    length is exactly ``l`` (unbiased, unlike round), the leapfrog loop
    runs to the block max ``ceil(l/e)`` with per-lane masking — stable
    across seeds except at exact-integer crossings — and the per-chain
    +-1-step spread also breaks trajectory-length resonances. During
    burn-in the trip count stays the uniform rounded value (it re-tunes
    every iteration anyway)."""
    x_pad, y_pad, row_mask, loc, ivar, prior_const, temperature = prepare_data(model, x, y)
    if stream is None:
        stream = x_pad.shape[0] >= STREAM_MIN_ROWS
    if mxu_layer0 is None:
        # layer-0 MXU contracts over all P theta rows padded to the MXU's
        # 128-deep K. At HIGHEST (6 bf16 passes) narrow fan-in LOSES (iris
        # d0=4: 15.7M vs 21.6M, PROBE_IRIS_MXU.json; break-even at 64). The
        # round-4 bf16_3pass hi/lo split (half the passes, ~1e-4 rel error)
        # moves the crossover below 16: 1.22x at fan-in 16, 1.41x at 32,
        # 1.74x at 64 at matching acceptance (PROBE_WIDE_MXU.json) —
        # auto-enable from 16 features WITH bf16_3pass; iris stays VPU.
        mxu_layer0 = stream and extract_arch(model)[0][0] >= 16
    if matmul_precision is None:
        matmul_precision = "bf16_3pass" if mxu_layer0 else "highest"
    if stream:
        vg_math = make_vg_stream(model, x_pad, y_pad, row_mask, loc, ivar,
                                 prior_const, temperature, mxu_layer0=mxu_layer0,
                                 matmul_precision=matmul_precision)
    else:
        vg_math = make_vg(model, x_pad, y_pad, row_mask, loc, ivar, prior_const,
                          temperature)
    P = model.num_params
    P_pad = ((P + 7) // 8) * 8  # sublane-aligned parameter rows for the HBM DMA
    # record_extras packs val (row P) + moved flag (row P+1) into the stage
    rows_rec = ((P + 2 + 7) // 8) * 8 if record_extras else P_pad
    n_pad, d_in = x_pad.shape
    k_out = y_pad.shape[1]
    kept = (num_iters - num_burnin_iters) // record_thin
    step = float(step)
    if l_rounding not in ("round", "stochastic"):
        raise ValueError(f"l_rounding must be 'round' or 'stochastic', got "
                         f"{l_rounding!r}")
    stoch_l = tuner is not None and l_rounding == "stochastic"

    def kernel(seed_ref, theta_ref, x_ref, y_ref, mask_ref, loc_ref, ivar_ref,
               samples_ref, final_ref, acc_ref,
               stage_ref, dma_sem):
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)

        xv = x_ref[:, :]
        yv = y_ref[:, :]
        maskv = mask_ref[:, :]
        locv = loc_ref[:, :]
        ivarv = ivar_ref[:, :]

        # layer-0 MXU selectors depend only on the data: build once, outside
        # the iteration loop
        premul = (vg_math.make_premul(xv)
                  if getattr(vg_math, "make_premul", None) else None)

        def vg(theta):
            if premul is not None:
                return vg_math(theta, xv, yv, maskv, locv, ivarv, premul=premul)
            return vg_math(theta, xv, yv, maskv, locv, ivarv)

        theta0 = theta_ref[:, :]
        val0, grad0 = vg(theta0)
        acc0 = jnp.zeros((1, theta0.shape[1]), dtype=jnp.float32)
        stage_ref[:, :] = jnp.zeros((rows_rec, theta0.shape[1]), dtype=jnp.float32)

        step0 = jnp.float32(step)
        if stoch_l:
            n_steps0 = jnp.full((1, chain_block), num_steps, dtype=jnp.int32)
        else:
            n_steps0 = jnp.int32(num_steps)
        tuner_m = jnp.log(10.0 * step0)
        barh0 = jnp.float32(0.0)
        logbare0 = jnp.float32(0.0)

        def iteration(t, carry):
            theta, val, grad, acc, cur_step, cur_n_steps, barh, logbare = carry
            theta_prev = theta
            mom = _normal(theta.shape)
            h_cur = -val + 0.5 * jnp.sum(mom * mom, axis=0, keepdims=True)

            # leapfrog
            p_half = mom + 0.5 * cur_step * grad

            if stoch_l:
                # lane-divergent trip counts (post-burn-in stochastic
                # rounding): run to the block max with per-lane masking —
                # finished lanes get zero increments, so the recomputed
                # value/grad stay at their trajectory end
                def lf_body(s, c):
                    th, pm, v, g = c
                    stepfac = jnp.where(s < cur_n_steps, cur_step, 0.0)
                    th = th + stepfac * pm
                    v, g = vg(th)
                    pmfac = jnp.where(s == cur_n_steps - 1, 0.5, 1.0) * stepfac
                    pm = pm + pmfac * g
                    return (th, pm, v, g)

                trip = jnp.max(cur_n_steps)
            else:
                def lf_body(s, c):
                    th, pm, v, g = c
                    th = th + cur_step * pm
                    v, g = vg(th)
                    factor = jnp.where(s == cur_n_steps - 1, 0.5, 1.0)
                    pm = pm + factor * cur_step * g
                    return (th, pm, v, g)

                trip = cur_n_steps

            th, pm, v, g = jax.lax.fori_loop(
                0, trip, lf_body, (theta, p_half, val, grad))

            h_prop = -v + 0.5 * jnp.sum(pm * pm, axis=0, keepdims=True)
            rates = jnp.minimum(jnp.exp(h_cur - h_prop), 1.0)
            u = _uniform(h_prop.shape)
            accept = u < rates

            theta = jnp.where(accept, th, theta)
            val = jnp.where(accept, v, val)
            grad = jnp.where(accept, g, grad)
            # post-burn-in acceptance counters (scanned-chain semantics)
            acc = acc + jnp.where(t >= num_burnin_iters, 1.0, 0.0) * jnp.where(accept, 1.0, 0.0)

            if tuner is not None:
                # population dual averaging (Hoffman-Gelman Alg 5 on the
                # block-mean acceptance), frozen after burn-in
                it = (t + 1).astype(jnp.float32)
                d_w = 1.0 / (it + tuner.t0)
                e_w = jnp.exp(-tuner.k * jnp.log(it))  # it**-k (Mosaic has no powf)
                mean_rate = jnp.mean(rates)
                new_barh = (1.0 - d_w) * barh + d_w * (tuner.d - mean_rate)
                loge = tuner_m - jnp.sqrt(it) * new_barh / tuner.g
                if tuner.eub is not None:
                    loge = jnp.minimum(loge, jnp.float32(math.log(tuner.eub)))
                new_logbare = e_w * loge + (1.0 - e_w) * logbare
                last_burnin = t == num_burnin_iters - 1
                new_step = jnp.where(last_burnin, jnp.exp(new_logbare), jnp.exp(loge))
                ratio = tuner.l / new_step
                rounded = jnp.clip(jnp.round(ratio).astype(jnp.int32),
                                   1, max_num_steps)
                if stoch_l:
                    # freeze by per-lane stochastic rounding (see docstring)
                    n_lo = jnp.floor(ratio)
                    frac = ratio - n_lo
                    u = _uniform((1, chain_block))
                    stoch_n = jnp.clip(
                        n_lo.astype(jnp.int32) + (u < frac).astype(jnp.int32),
                        1, max_num_steps)
                    new_n_steps = jnp.where(last_burnin, stoch_n,
                                            jnp.broadcast_to(rounded,
                                                             (1, chain_block)))
                else:
                    new_n_steps = rounded
                tune_now = t < num_burnin_iters
                barh = jnp.where(tune_now, new_barh, barh)
                logbare = jnp.where(tune_now, new_logbare, logbare)
                cur_step = jnp.where(tune_now, new_step, cur_step)
                cur_n_steps = jnp.where(tune_now, new_n_steps, cur_n_steps)

            # record post-burn-in samples: stage in VMEM, DMA to HBM
            rec = jnp.logical_and(t >= num_burnin_iters,
                                  (t - num_burnin_iters) % record_thin == 0)

            @pl.when(rec)
            def _():
                stage_ref[:P, :] = theta
                if record_extras:
                    stage_ref[P:P + 1, :] = val
                    moved = jnp.any(theta != theta_prev, axis=0, keepdims=True)
                    stage_ref[P + 1:P + 2, :] = moved.astype(jnp.float32)
                idx = (t - num_burnin_iters) // record_thin
                dma = pltpu.make_async_copy(
                    stage_ref,
                    samples_ref.at[idx, :, pl.ds(i_blk * chain_block, chain_block)],
                    dma_sem,
                )
                dma.start()
                dma.wait()

            return (theta, val, grad, acc, cur_step, cur_n_steps, barh, logbare)

        theta, val, grad, acc, *_ = jax.lax.fori_loop(
            0, num_iters, iteration,
            (theta0, val0, grad0, acc0, step0, n_steps0, barh0, logbare0))
        final_ref[:, :] = theta
        acc_ref[:, :] = acc

    def fn(seed, theta0s):
        theta0s = jnp.asarray(theta0s, dtype=jnp.float32)
        C = theta0s.shape[0]
        if C % chain_block != 0:
            raise ValueError(f"{C} chains not a multiple of chain_block {chain_block}")
        num_blocks = C // chain_block
        theta_t = theta0s.T  # [P, C]

        samples, final, acc = pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((P, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, d_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, k_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # samples stay in HBM
                pl.BlockSpec((P, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kept, rows_rec, C), jnp.float32),
                jax.ShapeDtypeStruct((P, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_rec, chain_block), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=vmem_limit_bytes,
            ),
        )(jnp.asarray([seed], jnp.int32), theta_t,
          jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(row_mask),
          jnp.asarray(loc), jnp.asarray(ivar))
        # [kept, rows_rec, C] -> [kept, C, P]
        out = (jnp.swapaxes(samples[:, :P, :], 1, 2), final.T, acc[0])
        if record_extras:
            out = out + (samples[:, P, :],
                         samples[:, P + 1, :].astype(jnp.int32))
        return out

    return fn
