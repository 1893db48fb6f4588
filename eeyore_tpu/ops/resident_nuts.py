"""VMEM-resident fixed-budget NUTS, data-on-sublanes layout (iris-class).

The dense chain-tile NUTS kernel (ops/resident_nuts_dense.py) covers
datasets small enough to unroll (n <= MAX_DENSE_ROWS); this is the same
fully-static tree — doublings AND subtree leaves unrolled, checkpoint
stack as a python list with static indices — in the resident_hmc.py
layout: chain state as [P, C] arrays (parameters on sublanes, chains on
lanes), the log-posterior+gradient evaluated by the row-streaming vg
(ops/mlp_math.make_vg_stream, with the MXU layer-0 panels for wide
fan-in). Per-chain tree adaptivity is [1, C] row masking that broadcasts
over the parameter axis — structurally simpler than the dense kernel's
per-parameter tile tuples.

Semantics match samplers/nuts.py ``_tree_fixed``/``_build_subtree_fixed``
(iterative multinomial NUTS, Betancourt-biased merge, Stan divergence
threshold; reference anchor: the leapfrog/accept algebra of
/root/reference/eeyore/samplers/hmc.py:100-148). Kernel PRNG draws are
statistically equivalent to jax.random, not bit-matched — validated by
moments/accept parity vs the scanned fixed-budget NUTS
(benchmarks/validate_dense_nuts.py --iris).

Identity mass matrix. Program size grows as 2^max_depth x (streamed vg);
keep max_depth small (3-5) and pick it with samplers.choose_max_depth.
"""

import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal as _normal, uniform as _uniform
from eeyore_tpu.ops.mlp_math import (
    extract_arch,
    make_vg,
    make_vg_stream,
    prepare_data,
)
from eeyore_tpu.ops.resident_hmc import STREAM_MIN_ROWS

DIVERGENCE_THRESHOLD = 1000.0


def _trailing_ones(n):
    count = 0
    while n & 1:
        count += 1
        n >>= 1
    return count


def make_resident_nuts(model, x, y, step, max_depth, num_iters,
                       num_burnin_iters=0, chain_block=256, record_thin=1,
                       tuner=None, stream=None, vmem_limit_bytes=None,
                       mxu_layer0=None, matmul_precision=None, inv_mass=None,
                       record_extras=False):
    """Build ``fn(seed, theta0s [C, P]) -> (samples [kept, C, P], final
    [C, P], accept_sums [C], divergent_sums [C])`` running the whole
    fixed-budget NUTS loop on-chip in the sublane layout.

    Same tuner contract as the dense NUTS kernel: optional population
    dual averaging of one shared step on the block-mean trajectory
    accept_stat (construct the HMCDATuner WITHOUT ``l``).

    ``inv_mass``: optional FROZEN diagonal of M^-1 ([P] array), the
    probe-and-freeze bridge for the scanned ``mass_adapt`` warmup —
    shipped as a [P, 1] VMEM input (lane-broadcast against the [P, C]
    state tiles, the same pattern as the prior's loc/ivar)."""
    x_pad, y_pad, row_mask, loc, ivar, prior_const, temperature = \
        prepare_data(model, x, y)
    if stream is None:
        stream = x_pad.shape[0] >= STREAM_MIN_ROWS
    if mxu_layer0 is None:
        mxu_layer0 = stream and extract_arch(model)[0][0] >= 16
    if matmul_precision is None:
        matmul_precision = "bf16_3pass" if mxu_layer0 else "highest"
    if stream:
        vg_math = make_vg_stream(model, x_pad, y_pad, row_mask, loc, ivar,
                                 prior_const, temperature,
                                 mxu_layer0=mxu_layer0,
                                 matmul_precision=matmul_precision)
    else:
        vg_math = make_vg(model, x_pad, y_pad, row_mask, loc, ivar,
                          prior_const, temperature)
    P = model.num_params
    P_pad = ((P + 7) // 8) * 8
    # record_extras packs val (row P) + moved flag (row P+1) into the stage
    rows_rec = ((P + 2 + 7) // 8) * 8 if record_extras else P_pad
    n_pad, d_in = x_pad.shape
    k_out = y_pad.shape[1]
    D = int(max_depth)
    if D < 1:
        raise ValueError("max_depth must be >= 1")
    if tuner is not None and tuner.l is not None:
        raise ValueError("NUTS chooses its own trajectory length; construct "
                         "the tuner without l (HMCDATuner())")
    kept = (num_iters - num_burnin_iters) // record_thin
    step = float(step)
    NEG_INF = float("-inf")  # python float: pallas rejects captured jnp scalars
    metric = inv_mass is not None
    if metric:
        import numpy as _np
        im_arr = _np.asarray(inv_mass, _np.float32).reshape(P, 1)
        if _np.any(im_arr <= 0):
            raise ValueError("inv_mass must be positive")
        msc_arr = 1.0 / _np.sqrt(im_arr)  # momentum scale sqrt(M)

    def kernel(seed_ref, theta_ref, x_ref, y_ref, mask_ref, loc_ref, ivar_ref,
               *rest):
        if metric:
            (im_ref, msc_ref, samples_ref, final_ref, acc_ref, div_ref,
             stage_ref, dma_sem) = rest
        else:
            (samples_ref, final_ref, acc_ref, div_ref,
             stage_ref, dma_sem) = rest
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)
        imv = im_ref[:, :] if metric else None    # [P, 1]
        mscv = msc_ref[:, :] if metric else None

        xv = x_ref[:, :]
        yv = y_ref[:, :]
        maskv = mask_ref[:, :]
        locv = loc_ref[:, :]
        ivarv = ivar_ref[:, :]
        premul = (vg_math.make_premul(xv)
                  if getattr(vg_math, "make_premul", None) else None)

        def vg(theta):
            if premul is not None:
                return vg_math(theta, xv, yv, maskv, locv, ivarv, premul=premul)
            return vg_math(theta, xv, yv, maskv, locv, ivarv)

        theta0 = theta_ref[:, :]                      # [P, C]
        C = theta0.shape[1]
        row = (1, C)
        val0, grad0 = vg(theta0)                       # [1, C], [P, C]
        zeros_row = jnp.zeros(row, dtype=jnp.float32)
        stage_ref[:, :] = jnp.zeros((rows_rec, C), dtype=jnp.float32)

        if tuner is not None:
            tuner_m = jnp.float32(math.log(10.0 * step))

        def u01(shape):
            return 1.0 - _uniform(shape)               # [0, 1)

        def logaddexp(a, b):
            m = jnp.maximum(a, b)
            r = m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))
            return jnp.where(m == NEG_INF, m, r)

        def mdot(a, b):
            """metric inner product sum_p M^-1[p] a[p] b[p] — [1, C]"""
            t = (imv * a) * b if metric else a * b
            return jnp.sum(t, axis=0, keepdims=True)

        def is_uturn(dtheta, r_left, r_right):
            return jnp.logical_or(mdot(dtheta, r_left) < 0.0,
                                  mdot(dtheta, r_right) < 0.0)

        def leapfrog(th, rho, g, step_s):
            rho = rho + (0.5 * step_s) * g
            th = th + step_s * (imv * rho if metric else rho)
            v, g = vg(th)
            rho = rho + (0.5 * step_s) * g
            return th, rho, v, g

        def build_subtree(depth, th, rho, g, logp0, step_s):
            target = zeros_row
            lse = jnp.full(row, NEG_INF)
            prop_t, prop_v, prop_g = th, zeros_row, g
            sum_alpha = zeros_row
            num_alpha = zeros_row
            turning = jnp.zeros(row, dtype=jnp.bool_)
            diverging = jnp.zeros(row, dtype=jnp.bool_)
            ckpt = [None] * max(D - 1, 1)

            for n in range(2 ** depth):
                live = jnp.logical_not(turning | diverging)
                th, rho, target, g = leapfrog(th, rho, g, step_s)
                logp = target - 0.5 * mdot(rho, rho)
                w = logp - logp0
                leaf_div = jnp.logical_not(w > -DIVERGENCE_THRESHOLD)
                alpha = jnp.minimum(jnp.exp(w), 1.0)
                alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)

                w_eff = jnp.where(live, w, NEG_INF)
                new_lse = logaddexp(lse, w_eff)
                take = live & (jnp.log(u01(row)) < w_eff - new_lse)
                prop_t = jnp.where(take, th, prop_t)
                prop_v = jnp.where(take, target, prop_v)
                prop_g = jnp.where(take, g, prop_g)
                lse = new_lse

                pc = bin(n).count("1")
                if n % 2 == 0:
                    ckpt[pc] = (th, rho)
                else:
                    found = jnp.zeros(row, dtype=jnp.bool_)
                    for i in range(pc - _trailing_ones(n), pc):
                        ck_t, ck_r = ckpt[i]
                        found = found | is_uturn(th - ck_t, ck_r, rho)
                    turning = turning | (live & found)
                diverging = diverging | (live & leaf_div)
                sum_alpha = sum_alpha + jnp.where(live, alpha, 0.0)
                num_alpha = num_alpha + jnp.where(live, 1.0, 0.0)

            return {"theta": th, "rho": rho, "grad": g, "lse": lse,
                    "prop": (prop_t, prop_v, prop_g),
                    "sum_alpha": sum_alpha, "num_alpha": num_alpha,
                    "turning": turning, "diverging": diverging}

        def iteration(t, carry):
            theta, val, grad, step_s, barh, logbare = carry
            theta_prev = theta

            mom = _normal(theta.shape)
            if metric:
                mom = mscv * mom                  # rho ~ N(0, M)
            logp0 = val - 0.5 * mdot(mom, mom)

            th_l = th_r = theta
            r_l = r_r = mom
            g_l = g_r = grad
            prop_t, prop_v, prop_g = theta, val, grad
            lse = zeros_row
            sum_alpha = zeros_row
            num_alpha = zeros_row
            turning = jnp.zeros(row, dtype=jnp.bool_)
            diverging = jnp.zeros(row, dtype=jnp.bool_)

            for depth in range(D):
                active = jnp.logical_not(turning | diverging)
                go_right = u01(row) < 0.5

                end_t = jnp.where(go_right, th_r, th_l)
                # orient momentum with where-selects, not a [1,C] x [P,C]
                # sign multiply (Mosaic: "Not implemented: Sublane
                # broadcast" for the row-times-matrix product at P=27)
                end_r = jnp.where(go_right, r_r, -r_l)
                end_g = jnp.where(go_right, g_r, g_l)

                sub = build_subtree(depth, end_t, end_r, end_g, logp0,
                                    step_s)

                bad = sub["turning"] | sub["diverging"]
                sum_alpha = sum_alpha + jnp.where(active, sub["sum_alpha"], 0.0)
                num_alpha = num_alpha + jnp.where(active, sub["num_alpha"], 0.0)

                accept_log_prob = jnp.minimum(sub["lse"] - lse, 0.0)
                take = active & jnp.logical_not(bad) & (
                    jnp.log(u01(row)) < accept_log_prob)
                s_t, s_v, s_g = sub["prop"]
                prop_t = jnp.where(take, s_t, prop_t)
                prop_v = jnp.where(take, s_v, prop_v)
                prop_g = jnp.where(take, s_g, prop_g)
                ok = active & jnp.logical_not(bad)
                lse = jnp.where(ok, logaddexp(lse, sub["lse"]), lse)

                okr = ok & go_right
                okl = ok & jnp.logical_not(go_right)
                new_r = jnp.where(go_right, sub["rho"], -sub["rho"])
                th_r = jnp.where(okr, sub["theta"], th_r)
                r_r = jnp.where(okr, new_r, r_r)
                g_r = jnp.where(okr, sub["grad"], g_r)
                th_l = jnp.where(okl, sub["theta"], th_l)
                r_l = jnp.where(okl, new_r, r_l)
                g_l = jnp.where(okl, sub["grad"], g_l)

                whole_turn = ok & is_uturn(th_r - th_l, r_l, r_r)
                turning = turning | (active & (bad | whole_turn))
                diverging = diverging | (active & sub["diverging"])

            theta, val, grad = prop_t, prop_v, prop_g
            accept_stat = sum_alpha / jnp.maximum(num_alpha, 1.0)
            # gate with where on the row (a scalar `post * accept_stat`
            # multiply hit Mosaic's "Not implemented: Sublane broadcast"
            # on the [1, C] layouts here)
            # accumulate into the OUTPUT REFS, not the fori carry: adding
            # a tree-derived [1, C] row into a loop-carried row trips
            # Mosaic's unimplemented sublane-broadcast relayout (the ref
            # round-trip forces the canonical layout on both sides)
            @pl.when(t >= num_burnin_iters)
            def _():
                acc_ref[:, :] = acc_ref[:, :] + accept_stat
                div_ref[:, :] = div_ref[:, :] + jnp.where(diverging, 1.0, 0.0)

            if tuner is not None:
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
                new_step = jnp.where(last_burnin, jnp.exp(new_logbare),
                                     jnp.exp(loge))
                tune_now = t < num_burnin_iters
                barh = jnp.where(tune_now, new_barh, barh)
                logbare = jnp.where(tune_now, new_logbare, logbare)
                step_s = jnp.where(tune_now, new_step, step_s)

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
                    samples_ref.at[idx, :, pl.ds(i_blk * chain_block,
                                                 chain_block)],
                    dma_sem,
                )
                dma.start()
                dma.wait()

            return (theta, val, grad, step_s, barh, logbare)

        acc_ref[:, :] = jnp.zeros(row, dtype=jnp.float32)
        div_ref[:, :] = jnp.zeros(row, dtype=jnp.float32)
        theta, val, grad, *_ = jax.lax.fori_loop(
            0, num_iters, iteration,
            (theta0, val0, grad0, jnp.float32(step),
             jnp.float32(0.0), jnp.float32(0.0)))
        final_ref[:, :] = theta

    def fn(seed, theta0s):
        theta0s = jnp.asarray(theta0s, dtype=jnp.float32)
        C = theta0s.shape[0]
        if C % chain_block != 0:
            raise ValueError(f"{C} chains not a multiple of chain_block "
                             f"{chain_block}")
        num_blocks = C // chain_block
        theta_t = theta0s.T                            # [P, C]

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((P, chain_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, k_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [jnp.asarray([seed], jnp.int32), theta_t,
                jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(row_mask),
                jnp.asarray(loc), jnp.asarray(ivar)]
        if metric:
            in_specs += [pl.BlockSpec((P, 1), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)] * 2
            args += [jnp.asarray(im_arr), jnp.asarray(msc_arr)]

        samples, final, acc, div = pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((P, chain_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chain_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chain_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kept, rows_rec, C), jnp.float32),
                jax.ShapeDtypeStruct((P, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
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
        )(*args)
        out = (jnp.swapaxes(samples[:, :P, :], 1, 2), final.T,
               acc[0], div[0])
        if record_extras:
            out = out + (samples[:, P, :],
                         samples[:, P + 1, :].astype(jnp.int32))
        return out

    return fn
