"""VMEM-resident gradient-light samplers: MALA, MH, and blocked Gibbs, each
as one whole-loop Pallas kernel.

Same design as ops/resident_hmc.py — the ENTIRE sampling loop runs on-chip
with chain state (theta, log-target, gradient) held in VMEM for the whole
run, touching HBM once per recorded sample via an async DMA of the
[P_pad, chain_block] staging tile. Layout: parameters on sublanes, chains on
lanes; the log-posterior (+ gradient for MALA) comes from the shared
chain-lane math in ops/mlp_math.py.

Semantics match the scanned kernels exactly:
- MALA (samplers/mala.py; reference /root/reference/eeyore/samplers/mala.py:35-66):
  proposal mean theta + 0.5*step*grad, scale sqrt(step), full asymmetric
  Hastings correction with the reverse kernel centered at the proposed drift.
  The sqrt(step)-Normal log-density constants cancel between the forward and
  reverse terms, so only the quadratic forms are computed.
- MH (samplers/mh.py; reference metropolis_hastings.py:25-67): symmetric iid
  Normal proposal of a fixed scale — no gradient at all, so the kernel uses
  the value-only math (make_vg(with_grad=False)): one forward pass per
  iteration, no backward.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal as _normal, uniform as _uniform
from eeyore_tpu.ops.mlp_math import make_vg, make_vg_stream, prepare_data
from eeyore_tpu.ops.resident_hmc import STREAM_MIN_ROWS


def _make_resident(model, x, y, num_iters, num_burnin_iters, chain_block,
                   record_thin, iteration_factory, with_grad, acc_rows=1,
                   consts=(), stream=None, mxu_layer0=None,
                   record_extras=False):
    """Shared scaffold: build fn(seed, theta0s [C, P]) ->
    (samples [kept, C, P], final [C, P], accept_counts [C] or [C, acc_rows]).

    ``record_extras=True`` additionally records, per kept step, the
    log-target value and an exact per-iteration moved/accepted flag —
    PACKED into two extra stage rows of the same record DMA (zero extra
    transfers; the sublane pad often absorbs them entirely). The return
    gains ``(target_vals [kept, C], accepted [kept, C])`` at the end.

    ``iteration_factory(vg, const_vals, raw) -> (state_init, move)`` where
    ``raw = (x, y, mask, loc, ivar)`` are the loaded VMEM data values,
    ``state_init(theta0) -> (val0, grad0, aux0)`` computes the initial carry
    (``grad0`` is a [1, C] dummy for gradient-free kernels; ``aux0`` is an
    arbitrary tuple-pytree of [*, C] arrays — e.g. the blocked-Gibbs
    incremental activation cache — or ``()``), and
    ``move(theta, val, grad, acc, aux, gate, t) -> (theta, val, grad, acc,
    aux)`` is one iteration (``t`` is the traced iteration index, for
    iteration-scheduled moves like tempering swaps). ``acc_rows`` > 1 gives
    per-sub-move acceptance counters
    (blocked Gibbs). ``consts`` is a tuple of 2D float32 numpy arrays shipped
    to the kernel as broadcast VMEM inputs (Pallas kernels cannot capture
    traced array constants) and handed to the factory as loaded values.
    """
    x_pad, y_pad, row_mask, loc, ivar, prior_const, temperature = prepare_data(model, x, y)
    if stream is None:
        stream = x_pad.shape[0] >= STREAM_MIN_ROWS
    if mxu_layer0 is None:
        from eeyore_tpu.ops.mlp_math import extract_arch

        # bf16_3pass (round 4) wins from fan-in 16 up: 1.22x at 16, 1.41x
        # at 32, 1.74x at 64 over the VPU schedule at matching acceptance
        # (PROBE_WIDE_MXU.json); HIGHEST only broke even at 64. Iris
        # (fan-in 4) still loses to K padding — threshold 16.
        mxu_layer0 = stream and extract_arch(model)[0][0] >= 16
    if stream:
        vg_math = make_vg_stream(model, x_pad, y_pad, row_mask, loc, ivar,
                                 prior_const, temperature, with_grad=with_grad,
                                 mxu_layer0=mxu_layer0,
                                 matmul_precision="bf16_3pass" if mxu_layer0
                                 else "highest")
    else:
        vg_math = make_vg(model, x_pad, y_pad, row_mask, loc, ivar, prior_const,
                          temperature, with_grad=with_grad)
    P = model.num_params
    P_pad = ((P + 7) // 8) * 8
    # extras pack val (row P) and the moved flag (row P+1) into the stage
    rows_rec = ((P + 2 + 7) // 8) * 8 if record_extras else P_pad
    n_pad, d_in = x_pad.shape
    k_out = y_pad.shape[1]
    kept = (num_iters - num_burnin_iters) // record_thin
    consts = tuple(np.asarray(c, dtype=np.float32) for c in consts)

    def kernel(seed_ref, theta_ref, x_ref, y_ref, mask_ref, loc_ref, ivar_ref,
               *rest):
        const_refs = rest[:len(consts)]
        samples_ref, final_ref, acc_ref, stage_ref, dma_sem = rest[len(consts):]
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)

        xv = x_ref[:, :]
        yv = y_ref[:, :]
        maskv = mask_ref[:, :]
        locv = loc_ref[:, :]
        ivarv = ivar_ref[:, :]
        const_vals = tuple(r[:, :] for r in const_refs)

        premul = (vg_math.make_premul(xv)
                  if getattr(vg_math, "make_premul", None) else None)

        def vg(theta):
            if premul is not None:
                return vg_math(theta, xv, yv, maskv, locv, ivarv, premul=premul)
            return vg_math(theta, xv, yv, maskv, locv, ivarv)

        state_init, move = iteration_factory(vg, const_vals,
                                             (xv, yv, maskv, locv, ivarv))

        theta0 = theta_ref[:, :]
        val0, grad0, aux0 = state_init(theta0)
        acc0 = jnp.zeros((acc_rows, theta0.shape[1]), dtype=jnp.float32)
        stage_ref[:, :] = jnp.zeros((rows_rec, theta0.shape[1]), dtype=jnp.float32)

        def iteration(t, carry):
            theta, val, grad, acc, aux = carry
            theta_prev = theta
            # acceptance counters are post-burn-in (the scanned chains'
            # acceptance_rate semantics)
            gate = jnp.where(t >= num_burnin_iters, 1.0, 0.0)
            theta, val, grad, acc, aux = move(theta, val, grad, acc, aux, gate, t)

            rec = jnp.logical_and(t >= num_burnin_iters,
                                  (t - num_burnin_iters) % record_thin == 0)

            @pl.when(rec)
            def _():
                stage_ref[:P, :] = theta
                if record_extras:
                    stage_ref[P:P + 1, :] = val
                    moved = jnp.any(theta != theta_prev, axis=0,
                                    keepdims=True)
                    stage_ref[P + 1:P + 2, :] = moved.astype(jnp.float32)
                idx = (t - num_burnin_iters) // record_thin
                dma = pltpu.make_async_copy(
                    stage_ref,
                    samples_ref.at[idx, :, pl.ds(i_blk * chain_block, chain_block)],
                    dma_sem,
                )
                dma.start()
                dma.wait()

            return (theta, val, grad, acc, aux)

        theta, val, grad, acc, aux = jax.lax.fori_loop(
            0, num_iters, iteration, (theta0, val0, grad0, acc0, aux0))
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
            ] + [
                pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
                for c in consts
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # samples stay in HBM
                pl.BlockSpec((P, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((acc_rows, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kept, rows_rec, C), jnp.float32),
                jax.ShapeDtypeStruct((P, C), jnp.float32),
                jax.ShapeDtypeStruct((acc_rows, C), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows_rec, chain_block), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(jnp.asarray([seed], jnp.int32), theta_t,
          jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(row_mask),
          jnp.asarray(loc), jnp.asarray(ivar),
          *[jnp.asarray(c) for c in consts])
        acc_out = acc[0] if acc_rows == 1 else acc.T  # [C] or [C, acc_rows]
        out = (jnp.swapaxes(samples[:, :P, :], 1, 2), final.T, acc_out)
        if record_extras:
            out = out + (samples[:, P, :],                       # [kept, C]
                         samples[:, P + 1, :].astype(jnp.int32))
        return out

    return fn


def make_resident_mala(model, x, y, step, num_iters, num_burnin_iters=0,
                       chain_block=2048, record_thin=1, stream=None,
                       record_extras=False):
    """Whole-loop MALA: one fused value-and-grad per iteration, asymmetric
    Hastings correction, all state VMEM-resident."""
    step = float(step)
    sqrt_step = math.sqrt(step)

    def factory(vg, _consts, _raw):
        def state_init(theta0):
            val0, grad0 = vg(theta0)
            return val0, grad0, ()

        def move(theta, val, grad, acc, aux, gate, t):
            z = _normal(theta.shape)
            fwd_mean = theta + 0.5 * step * grad
            prop = fwd_mean + sqrt_step * z
            v_p, g_p = vg(prop)
            rev_mean = prop + 0.5 * step * g_p
            d_rev = theta - rev_mean
            # constants of the two sqrt(step)-Normal densities cancel;
            # ||prop - fwd_mean||^2 = step * sum(z^2)
            log_rate = (v_p - val
                        - (0.5 / step) * jnp.sum(d_rev * d_rev, axis=0, keepdims=True)
                        + 0.5 * jnp.sum(z * z, axis=0, keepdims=True))
            u = _uniform(log_rate.shape)
            accept = jnp.log(u) < log_rate
            theta = jnp.where(accept, prop, theta)
            val = jnp.where(accept, v_p, val)
            grad = jnp.where(accept, g_p, grad)
            return theta, val, grad, acc + gate * jnp.where(accept, 1.0, 0.0), aux

        return state_init, move

    return _make_resident(model, x, y, num_iters, num_burnin_iters,
                          chain_block, record_thin, factory, with_grad=True,
                          stream=stream, record_extras=record_extras)


def make_resident_mh(model, x, y, scale, num_iters, num_burnin_iters=0,
                     chain_block=2048, record_thin=1, stream=None,
                     record_extras=False):
    """Whole-loop random-walk MH: symmetric iid-Normal proposal; value-only
    math (no backward pass at all)."""
    scale = float(scale)

    def factory(v, _consts, _raw):
        def state_init(theta0):
            val0 = v(theta0)
            grad0 = jnp.zeros((1, theta0.shape[1]), dtype=jnp.float32)  # unused
            return val0, grad0, ()

        def move(theta, val, grad, acc, aux, gate, t):
            prop = theta + scale * _normal(theta.shape)
            v_p = v(prop)
            log_rate = v_p - val
            u = _uniform(log_rate.shape)
            accept = jnp.log(u) < log_rate
            theta = jnp.where(accept, prop, theta)
            val = jnp.where(accept, v_p, val)
            return theta, val, grad, acc + gate * jnp.where(accept, 1.0, 0.0), aux

        return state_init, move

    return _make_resident(model, x, y, num_iters, num_burnin_iters,
                          chain_block, record_thin, factory, with_grad=False,
                          stream=stream, record_extras=record_extras)


def make_resident_gibbs(model, x, y, scales=1.0, node_subblock_size=None,
                        num_iters=1000, num_burnin_iters=0,
                        chain_block=512, record_thin=1, record_extras=False):
    """Whole-loop blocked Metropolis-within-Gibbs (samplers/gibbs.py
    semantics; reference gibbs.py:73-96): one systematic sweep per iteration
    over the model's static node (sub-)blocks, each proposed with a
    per-block-scale Normal on just those coordinates and accepted with a
    full-log-target MH test — value-only math, no gradients anywhere.

    The sweep is UNROLLED over sub-blocks (their count and index masks are
    static per architecture), so each sub-block move is a masked [P, C]
    perturbation + an INCREMENTAL log-target evaluation
    (ops/mlp_math.py::make_incremental_gibbs): a node-block proposal only
    changes one unit's activation, so only that unit and the layers strictly
    downstream are recomputed from a VMEM-resident activation cache —
    bit-identical to the full forward (tests/test_mlp_math.py), ~2.5x fewer
    multiply-adds per sweep on mlp4323. Returns per-chain PER-SUB-BLOCK
    acceptance counts [C, num_sub_blocks] (the reference's
    block_acceptance_rate, chain_list.py:98-99). Rejected coordinates are
    restored before the next sub-block proposal (fixing the reference's
    rejected-coordinate leak — see samplers/gibbs.py docstring).
    """
    from eeyore_tpu.ops.mlp_math import make_incremental_gibbs
    from eeyore_tpu.samplers.gibbs import Gibbs

    blocking = Gibbs(model, scales=scales, node_subblock_size=node_subblock_size)
    P = model.num_params
    B = blocking.num_sub_blocks
    # [P, B] matrix of per-sub-block scaled index masks, shipped as a kernel
    # input (Pallas cannot capture traced array constants)
    scaled_masks = np.zeros((P, B), dtype=np.float32)
    for i, (indices, scale) in enumerate(blocking._sub_blocks):
        scaled_masks[np.asarray(indices, dtype=np.int64), i] = float(scale)

    # sub-block -> (layer, node) of the unit it perturbs (sub-blocks of one
    # node block all touch the same unit; order matches blocking._sub_blocks)
    sub_units = []
    for b, subs in enumerate(blocking.get_blocks()):
        l, j = model.layer_and_node_from_par_block(b)
        sub_units.extend([(l, j)] * len(subs))
    assert len(sub_units) == B

    x_pad, _, _, _, _, prior_const, temperature = prepare_data(model, x, y)
    _, inc_init, inc_updates = make_incremental_gibbs(
        model, x_pad.shape[0], temperature, prior_const)

    def factory(v, consts, raw):
        (sm,) = consts  # [P, B]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

        def state_init(theta0):
            val0, cache0 = inc_init(theta0, *raw)
            grad0 = jnp.zeros((1, theta0.shape[1]), dtype=jnp.float32)  # unused
            return val0, grad0, cache0

        def move(theta, val, grad, acc, cache, gate, t):
            for b in range(B):
                prop = theta + sm[:, b:b + 1] * _normal(theta.shape)
                v_p, cache_p = inc_updates[sub_units[b]](prop, *raw, cache)
                u = _uniform(v_p.shape)
                accept = jnp.log(u) < v_p - val
                theta = jnp.where(accept, prop, theta)
                val = jnp.where(accept, v_p, val)
                cache = tuple(
                    old if new is old else jnp.where(accept, new, old)
                    for old, new in zip(cache, cache_p))
                onehot = (row_ids == b).astype(jnp.float32)  # [B, 1]
                acc = acc + gate * onehot * jnp.where(accept, 1.0, 0.0)
            return theta, val, grad, acc, cache

        return state_init, move

    # stream=False: the factory evaluates through the incremental cache, not
    # vg (which must stay bit-identical to inc_init's op order anyway)
    return _make_resident(model, x, y, num_iters, num_burnin_iters,
                          chain_block, record_thin, factory, with_grad=False,
                          acc_rows=B, consts=(scaled_masks,), stream=False,
                          record_extras=record_extras)
