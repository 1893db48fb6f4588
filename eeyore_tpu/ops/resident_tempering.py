"""VMEM-resident power-posterior / parallel-tempering kernel.

The whole population-MCMC loop — within-chain moves on every ladder rung AND
the between-chain swap moves — runs in ONE Pallas kernel with all state
pinned in VMEM (reference semantics: /root/reference/eeyore/samplers/
power_posterior_sampler.py:15-183; scanned equivalent:
eeyore_tpu/samplers/power_posterior.py).

Layout: lanes hold ``num_ladders_per_block`` independent temperature ladders
side by side, LADDER-MAJOR: lane c = ladder * L + rung, rungs ordered as in
the reference (temperature ascending, the coldest chain LAST,
power_posterior_sampler.py:84-92). Adjacent rungs therefore sit on adjacent
lanes, and the even/odd stochastic swap sweep (the TPU-native scheme of
samplers/power_posterior.py::_between_moves_even_odd) is a pure LANE SHUFFLE:
``pltpu.roll`` by ±1 along the lane axis plus precomputed pair masks that
never cross a ladder boundary.

The kernel stores the UNTEMPERED log-target per lane and applies the
per-lane temperature (a broadcast VMEM constant) at each accept test. That
makes swaps free of log-target re-evaluations: for an adjacent pair (i, j),

    log_rate = (t_i - t_j) * (base_j - base_i)

needs only values already in VMEM — where the reference recomputes four
cross-temperature targets per swap attempt (power_posterior_sampler.py:135-141)
and the scanned even/odd path recomputes the untempered base per rung.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal as _normal, uniform as _uniform
from eeyore_tpu.ops.resident_walk import _make_resident
from eeyore_tpu.samplers.power_posterior import default_temperatures


def ladder_lane_constants(num_rungs, chain_block, temperatures):
    """Per-lane ladder constants for a ladder-major lane layout.

    Returns float32 [1, chain_block] arrays:
    - ``temps``: temperature of each lane's rung,
    - ``temps_right``: temperature of the lane one rung hotter→colder
      neighbour (lane + 1; arbitrary at ladder boundaries — always masked),
    - ``m_even`` / ``m_odd``: 1.0 where the lane is the LOWER member of an
      (even, even+1) / (odd, odd+1) rung pair, 0.0 elsewhere. Pairs never
      cross ladder boundaries (a lane with rung == L-1 is never lower).
    """
    L = int(num_rungs)
    if chain_block % L:
        raise ValueError(f"chain_block {chain_block} not a multiple of the "
                         f"ladder size {L}")
    temperatures = np.asarray(temperatures, dtype=np.float32)
    if temperatures.shape != (L,):
        raise ValueError(f"need {L} temperatures, got {temperatures.shape}")
    ladders = chain_block // L
    rung = np.tile(np.arange(L), ladders)
    temps = np.tile(temperatures, ladders)
    temps_right = np.roll(temps, -1)
    m_even = ((rung % 2 == 0) & (rung < L - 1)).astype(np.float32)
    m_odd = ((rung % 2 == 1) & (rung < L - 1)).astype(np.float32)
    return (temps.reshape(1, -1), temps_right.reshape(1, -1),
            m_even.reshape(1, -1), m_odd.reshape(1, -1))


def make_resident_tempering(model, x, y, num_rungs, step=0.01, sampler="MALA",
                            temperatures=None, between_step=10,
                            num_iters=1000, num_burnin_iters=0,
                            chain_block=2048, record_thin=1,
                            record_extras=False):
    """Whole-loop parallel tempering: ``fn(seed, theta0s [C, P])`` with
    ``C = num_ladders * num_rungs`` lanes, ladder-major (rung varies
    fastest, coldest rung LAST within each ladder, as the reference orders
    its chain list). Returns ``(samples [kept, C, P], final [C, P],
    counts [C, 2])`` where counts column 0 is post-burn-in within-chain
    acceptances and column 1 swap acceptances (counted once per pair, on the
    lower lane).

    ``sampler`` is 'MALA' (``step`` = Langevin step, asymmetric Hastings
    correction as samplers/mala.py) or 'MetropolisHastings' (``step`` =
    random-walk proposal scale) — the two ladder samplers the reference
    supports (power_posterior_sampler.py:68-82). Swaps run every
    ``between_step`` iterations with alternating even/odd parity.
    """
    if getattr(model, "temperature", None) is not None:
        raise ValueError("pass an untempered model; the ladder applies temperatures")
    if sampler not in ("MALA", "MetropolisHastings"):
        raise ValueError(f"unsupported ladder sampler {sampler!r} "
                         "(reference supports MetropolisHastings and MALA)")
    L = int(num_rungs)
    if temperatures is None:
        temperatures = default_temperatures(L)
    consts = ladder_lane_constants(L, chain_block, temperatures)

    step = float(step)
    sqrt_step = math.sqrt(step)
    with_grad = sampler == "MALA"

    def factory(vg, const_vals, _raw):
        temps, temps_right, m_even, m_odd = const_vals

        def state_init(theta0):
            if with_grad:
                val0, grad0 = vg(theta0)
            else:
                val0 = vg(theta0)
                grad0 = jnp.zeros((1, theta0.shape[1]), dtype=jnp.float32)
            return val0, grad0, ()

        def within_move(theta, val, grad, acc_w, gate):
            z = _normal(theta.shape)
            if with_grad:
                # tempered target t*base: drift uses the tempered gradient
                prop = theta + 0.5 * step * (temps * grad) + sqrt_step * z
                v_p, g_p = vg(prop)
                d_rev = theta - (prop + 0.5 * step * (temps * g_p))
                log_rate = (temps * (v_p - val)
                            - (0.5 / step) * jnp.sum(d_rev * d_rev, axis=0, keepdims=True)
                            + 0.5 * jnp.sum(z * z, axis=0, keepdims=True))
            else:
                prop = theta + step * z
                v_p = vg(prop)
                g_p = grad
                log_rate = temps * (v_p - val)
            u = _uniform(log_rate.shape)
            accept = jnp.log(u) < log_rate
            theta = jnp.where(accept, prop, theta)
            val = jnp.where(accept, v_p, val)
            if with_grad:
                grad = jnp.where(accept, g_p, grad)
            return theta, val, grad, acc_w + gate * jnp.where(accept, 1.0, 0.0)

        def swap_move(theta, val, grad, acc_s, gate, t):
            parity = (t // between_step) % 2
            is_lower = jnp.where(parity == 0, m_even, m_odd) > 0.5  # [1, C]
            # neighbours one lane over (lane c+1 = one rung colder);
            # pltpu.roll needs non-negative shifts: roll by C-1 == -1
            C = theta.shape[1]
            theta_r = pltpu.roll(theta, C - 1, axis=1)
            theta_l = pltpu.roll(theta, 1, axis=1)
            val_r = pltpu.roll(val, C - 1, axis=1)
            val_l = pltpu.roll(val, 1, axis=1)
            # pair (i=c, j=c+1): log_rate = (t_i - t_j) * (base_j - base_i)
            log_rate = (temps - temps_right) * (val_r - val)
            u = _uniform(val.shape)
            acc_lower = jnp.where(is_lower & (jnp.log(u) < log_rate), 1.0, 0.0)
            acc_upper = pltpu.roll(acc_lower, 1, axis=1)
            take_r = acc_lower > 0.5
            take_l = acc_upper > 0.5
            theta = jnp.where(take_r, theta_r, jnp.where(take_l, theta_l, theta))
            val = jnp.where(take_r, val_r, jnp.where(take_l, val_l, val))
            if with_grad:
                grad_r = pltpu.roll(grad, C - 1, axis=1)
                grad_l = pltpu.roll(grad, 1, axis=1)
                grad = jnp.where(take_r, grad_r, jnp.where(take_l, grad_l, grad))
            return theta, val, grad, acc_s + gate * acc_lower

        def move(theta, val, grad, acc, aux, gate, t):
            acc_w = acc[0:1, :]
            acc_s = acc[1:2, :]
            theta, val, grad, acc_w = within_move(theta, val, grad, acc_w, gate)
            do_swap = (t % between_step) == 0
            swap_gate = jnp.where(do_swap, 1.0, 0.0)
            theta_s, val_s, grad_s, acc_s = swap_move(theta, val, grad, acc_s,
                                                      gate * swap_gate, t)
            theta = jnp.where(do_swap, theta_s, theta)
            val = jnp.where(do_swap, val_s, val)
            if with_grad:
                grad = jnp.where(do_swap, grad_s, grad)
            return theta, val, grad, jnp.concatenate([acc_w, acc_s], axis=0), aux

        return state_init, move

    return _make_resident(model, x, y, num_iters, num_burnin_iters,
                          chain_block, record_thin, factory,
                          with_grad=with_grad, acc_rows=2, consts=consts,
                          record_extras=record_extras)
