"""VMEM-resident parallel tempering in the dense chain-tile layout.

Same population-MCMC-in-one-kernel design as ops/resident_tempering.py
(reference semantics: /root/reference/eeyore/samplers/power_posterior_sampler.py:15-183)
but on the dense chain-tile math of ops/mlp_dense.py: every scalar parameter
is one [8, lane_block] tile with chains on both sublanes and lanes. The
temperature ladder lives along the LANE axis of each sublane row — lane
column = ladder * L + rung, rungs temperature-ascending with the coldest
LAST, so every sublane row carries ``lane_block / L`` independent ladders
and a whole [8, lane_block] tile carries ``8 x lane_block / L``. Even/odd
swap rounds stay pure lane shuffles (pltpu.roll by +-1 within each tile,
non-negative shifts) with the same free-swap algebra as the sublane kernel:
the UNTEMPERED log-target is stored per chain, so an adjacent-pair swap is

    log_rate = (t_i - t_j) * (base_j - base_i)

with zero new log-target evaluations. Within-chain moves are dense MALA or
MH (the two ladder samplers the reference supports,
power_posterior_sampler.py:68-82) with the lane temperature applied at each
accept test.

Chain id for fn(seed, theta0s [C, P]): c = sublane * (C/8) + column, so
callers enumerate chains as (sublane, ladder, rung) with rung fastest;
because C/8 and lane_block are multiples of L, ``rung = c % L`` — the same
formula as the sublane kernel.
"""

import math

import jax.numpy as jnp
import numpy as np

from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal_tiles, uniform as _uniform
from eeyore_tpu.ops.resident_tempering import ladder_lane_constants
from eeyore_tpu.ops.resident_walk_dense import _make_resident_dense
from eeyore_tpu.samplers.power_posterior import default_temperatures


def make_resident_tempering_dense(model, x, y, num_rungs, step=0.01,
                                  sampler="MALA", temperatures=None,
                                  between_step=10, num_iters=1000,
                                  num_burnin_iters=0, chain_block=8192,
                                  record_thin=1, record_extras=False):
    """Whole-loop parallel tempering, dense layout: ``fn(seed,
    theta0s [C, P])`` with ``C = num_ladders * num_rungs`` chains (rung
    varies fastest; coldest rung last in each ladder). Returns
    ``(samples [kept, C, P], final [C, P], counts [C, 2])`` — counts column
    0 = post-burn-in within-chain acceptances, column 1 = swap acceptances
    (counted once per pair, on the lower lane)."""
    if getattr(model, "temperature", None) is not None:
        raise ValueError("pass an untempered model; the ladder applies temperatures")
    if sampler not in ("MALA", "MetropolisHastings"):
        raise ValueError(f"unsupported ladder sampler {sampler!r} "
                         "(reference supports MetropolisHastings and MALA)")
    L = int(num_rungs)
    if temperatures is None:
        temperatures = default_temperatures(L)
    lane_block = chain_block // 8
    consts = ladder_lane_constants(L, lane_block, temperatures)

    step = float(step)
    sqrt_step = math.sqrt(step)
    with_grad = sampler == "MALA"

    def factory(vg, tile, const_vals):
        temps, temps_right, m_even, m_odd = const_vals  # [1, lane_block] each

        def state_init(theta0):
            if with_grad:
                val0, grad0 = vg(theta0)
                return val0, tuple(grad0)
            return vg(theta0), ()

        def within_move(theta, val, grad, acc_w, gate):
            P = len(theta)
            z = normal_tiles(P, tile)
            if with_grad:
                # tempered target t*base: drift uses the tempered gradient
                prop = tuple(theta[p] + (0.5 * step) * (temps * grad[p])
                             + sqrt_step * z[p] for p in range(P))
                v_p, g_p = vg(prop)
                d0 = theta[0] - (prop[0] + (0.5 * step) * (temps * g_p[0]))
                rev_sq = d0 * d0
                z_sq = z[0] * z[0]
                for p in range(1, P):
                    dp = theta[p] - (prop[p] + (0.5 * step) * (temps * g_p[p]))
                    rev_sq = rev_sq + dp * dp
                    z_sq = z_sq + z[p] * z[p]
                log_rate = (temps * (v_p - val)
                            - (0.5 / step) * rev_sq + 0.5 * z_sq)
            else:
                prop = tuple(theta[p] + step * z[p] for p in range(len(theta)))
                v_p = vg(prop)
                g_p = grad
                log_rate = temps * (v_p - val)
            u = _uniform(tile)
            accept = jnp.log(u) < log_rate
            theta = tuple(jnp.where(accept, prop[p], theta[p])
                          for p in range(len(theta)))
            val = jnp.where(accept, v_p, val)
            if with_grad:
                grad = tuple(jnp.where(accept, g_p[p], grad[p])
                             for p in range(len(grad)))
            return theta, val, grad, acc_w + gate * jnp.where(accept, 1.0, 0.0)

        def swap_move(theta, val, grad, acc_s, gate, t):
            parity = (t // between_step) % 2
            is_lower = jnp.where(parity == 0, m_even, m_odd) > 0.5  # [1, lanes]
            W = tile[1]
            val_r = pltpu.roll(val, W - 1, axis=1)
            val_l = pltpu.roll(val, 1, axis=1)
            # pair (i=c, j=c+1): log_rate = (t_i - t_j) * (base_j - base_i)
            log_rate = (temps - temps_right) * (val_r - val)
            u = _uniform(tile)
            acc_lower = jnp.where(is_lower & (jnp.log(u) < log_rate), 1.0, 0.0)
            acc_upper = pltpu.roll(acc_lower, 1, axis=1)
            take_r = acc_lower > 0.5
            take_l = acc_upper > 0.5
            theta = tuple(
                jnp.where(take_r, pltpu.roll(th, W - 1, axis=1),
                          jnp.where(take_l, pltpu.roll(th, 1, axis=1), th))
                for th in theta)
            val = jnp.where(take_r, val_r, jnp.where(take_l, val_l, val))
            if with_grad:
                grad = tuple(
                    jnp.where(take_r, pltpu.roll(g, W - 1, axis=1),
                              jnp.where(take_l, pltpu.roll(g, 1, axis=1), g))
                    for g in grad)
            return theta, val, grad, acc_s + gate * acc_lower

        def move(theta, val, grad, accs, extra, gate, t):
            acc_w, acc_s = accs
            theta, val, grad, acc_w = within_move(theta, val, grad, acc_w, gate)
            do_swap = (t % between_step) == 0
            swap_gate = jnp.where(do_swap, 1.0, 0.0)
            theta_s, val_s, grad_s, acc_s = swap_move(theta, val, grad, acc_s,
                                                      gate * swap_gate, t)
            theta = tuple(jnp.where(do_swap, theta_s[p], theta[p])
                          for p in range(len(theta)))
            val = jnp.where(do_swap, val_s, val)
            if with_grad:
                grad = tuple(jnp.where(do_swap, grad_s[p], grad[p])
                             for p in range(len(grad)))
            return theta, val, grad, (acc_w, acc_s), extra

        return state_init, move

    return _make_resident_dense(model, x, y, num_iters, num_burnin_iters,
                                chain_block, record_thin, factory,
                                with_grad=with_grad, acc_tiles=2, consts=consts,
                                record_extras=record_extras)
