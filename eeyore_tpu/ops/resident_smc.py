"""VMEM-resident SMC mutation kernel + the full tempered-SMC driver on it.

SMC's hot path is the MCMC mutation pass: num_mutation_steps of MALA/MH per
particle per tempering stage (samplers/smc.py::_mutate — the scanned
jit(vmap(scan)) path streams every per-step tensor through HBM). Here the
whole mutation pass for a particle block runs in ONE Pallas kernel with
particle state pinned in VMEM, like the resident samplers
(ops/resident_walk.py).

Two SMC-specific twists:
- the tempered target is prior * lik^beta (samplers/smc.py tempering path),
  so the kernel uses the SPLIT chain-lane math (ops/mlp_math.py
  make_vg(split=True)): val = lp + beta*ll, grad = glp + beta*gll;
- beta is a RUNTIME SMEM scalar input, so one compiled kernel serves every
  tempering stage (a baked-in beta would recompile per stage — minutes per
  compile on this toolchain).

Non-architecture targets (DistributionModel + base_log_pdf — the scanned
SMCSampler's geometric path) use a GENERIC vg: the model's log-pdf closure
is traced per-lane via ``jax.vmap(jax.value_and_grad(...), in_axes=1)``
inside the kernel, so any jnp-written target runs resident, not just the
extract_arch model families. Mosaic must be able to lower whatever ops the
closure traces to — plain elementwise/reduction densities (mixtures,
Gaussians) do; exotic ops may fail at compile time, in which case use the
scanned path.

The kernel also returns the final per-particle log-likelihood (the
"potential"), which is exactly what the next stage's importance reweighting
needs — so the driver never recomputes it. Reweighting, ESS checks, and
systematic resampling are tiny O(N) host-of-kernel XLA ops
(samplers/smc.py::systematic_resample_indices) between kernel calls.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.kernel_prng import normal as _normal, uniform as _uniform
from eeyore_tpu.ops.mlp_math import make_vg, prepare_data
from eeyore_tpu.samplers.smc import log_ess, systematic_resample_indices


def _mutation_loop(vg, beta, theta0, step, num_mutation_steps, with_grad):
    """The shared in-kernel MALA/MH mutation loop at tempered target
    lp + beta * ll; ``vg(theta [P, cb])`` returns ``(ll, lp[, gll, glp])``
    as [1, cb] / [P, cb] tiles. Returns (theta, ll, acc_counts [1, cb])."""
    sqrt_step = math.sqrt(step)
    if with_grad:
        ll0, lp0, gll0, glp0 = vg(theta0)
        grad0 = glp0 + beta * gll0
    else:
        ll0, lp0 = vg(theta0)
        grad0 = jnp.zeros((1, theta0.shape[1]), dtype=jnp.float32)  # unused
    val0 = lp0 + beta * ll0
    acc0 = jnp.zeros((1, theta0.shape[1]), dtype=jnp.float32)

    def iteration(s, carry):
        theta, val, grad, ll, acc = carry
        z = _normal(theta.shape)
        if with_grad:
            prop = theta + 0.5 * step * grad + sqrt_step * z
            ll_p, lp_p, gll_p, glp_p = vg(prop)
            v_p = lp_p + beta * ll_p
            g_p = glp_p + beta * gll_p
            d_rev = theta - (prop + 0.5 * step * g_p)
            log_rate = (v_p - val
                        - (0.5 / step) * jnp.sum(d_rev * d_rev, axis=0, keepdims=True)
                        + 0.5 * jnp.sum(z * z, axis=0, keepdims=True))
        else:
            prop = theta + sqrt_step * z
            ll_p, lp_p = vg(prop)
            v_p = lp_p + beta * ll_p
            g_p = grad
            log_rate = v_p - val
        u = _uniform(log_rate.shape)
        accept = jnp.log(u) < log_rate
        theta = jnp.where(accept, prop, theta)
        val = jnp.where(accept, v_p, val)
        grad = jnp.where(accept, g_p, grad) if with_grad else grad
        ll = jnp.where(accept, ll_p, ll)
        return (theta, val, grad, ll, acc + jnp.where(accept, 1.0, 0.0))

    theta, val, grad, ll, acc = jax.lax.fori_loop(
        0, num_mutation_steps, iteration, (theta0, val0, grad0, ll0, acc0))
    return theta, ll, acc


def make_generic_vg(model, x, y, base_log_pdf, with_grad):
    """Lane-batched (ll, lp[, grads]) for a non-architecture target: the
    geometric path of samplers/smc.py (_potential/_base) with
    ll = log_target - base, lp = base, traced per-lane with
    ``vmap(value_and_grad, in_axes=1)`` — chains stay on lanes, any
    jnp-written log-pdf works (Mosaic permitting)."""
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)

    def ll_fn(th):
        return model.log_target(th, xj, yj) - base_log_pdf(th)

    def lp_fn(th):
        return base_log_pdf(th)

    def vg(theta):  # [P, cb]
        if with_grad:
            ll, gll = jax.vmap(jax.value_and_grad(ll_fn),
                               in_axes=1, out_axes=(0, 1))(theta)
            lp, glp = jax.vmap(jax.value_and_grad(lp_fn),
                               in_axes=1, out_axes=(0, 1))(theta)
            return (ll.reshape(1, -1), lp.reshape(1, -1), gll, glp)
        ll = jax.vmap(ll_fn, in_axes=1)(theta)
        lp = jax.vmap(lp_fn, in_axes=1)(theta)
        return ll.reshape(1, -1), lp.reshape(1, -1)

    return vg


def _ew_dot_general(a, b, dimension_numbers, **_):
    """dot_general as broadcast-multiply + axis-sum. vmap over lanes turns a
    user log-pdf's jnp.dot into BATCHED dot_generals Mosaic cannot lower
    (malformed TPU_DotDimensionNumbers for batched 1D dots) — and at the
    [P, chain_block] sizes here the MXU would lose anyway; elementwise VPU
    forms are the right lowering. Common vmap shapes avoid transposes; the
    general fallback uses the canonical (batch, free, contract) layout."""
    (cl, cr), (bl, br) = dimension_numbers
    cl, cr, bl, br = map(tuple, (cl, cr, bl, br))
    la = [d for d in range(a.ndim) if d not in cl + bl]
    lb = [d for d in range(b.ndim) if d not in cr + br]
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    if not la and not lb and bl == br and cl == cr:
        # vmapped vector-vector dot: same layout both sides
        out = a * b
        return out.sum(axis=cl) if cl else out
    if not cl and not la and bl == tuple(range(a.ndim)) \
            and br == tuple(range(len(br))):
        # vmapped scalar-times-array: lhs is batch-only
        return a.reshape(a.shape + (1,) * len(lb)) * b
    # general: operands to (batch, own-free, contract); singleton-expand
    # the other side's free dims
    a2 = jnp.transpose(a, bl + tuple(la) + cl)
    b2 = jnp.transpose(b, br + tuple(lb) + cr)
    nb, nla, nlb, nc = len(bl), len(la), len(lb), len(cl)
    a3 = a2.reshape(a2.shape[:nb + nla] + (1,) * nlb + a2.shape[nb + nla:])
    b3 = b2.reshape(b2.shape[:nb] + (1,) * nla + b2.shape[nb:])
    prod = a3 * b3
    if not nc:
        return prod
    return prod.sum(axis=tuple(range(prod.ndim - nc, prod.ndim)))


def _eval_jaxpr_ew_dots(jaxpr, consts, *args):
    """Interpret a jaxpr, rewriting every dot_general via _ew_dot_general
    (including inside nested pjit/custom-derivative sub-jaxprs)."""
    from jax._src import core as _core

    env = {}

    def read(v):
        return v.val if isinstance(v, _core.Literal) else env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name == "dot_general":
            outs = [_ew_dot_general(*invals, **eqn.params)]
        elif name in ("pjit", "closed_call", "custom_jvp_call",
                      "custom_vjp_call", "custom_vjp_call_jaxpr"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
            sub_consts = (sub.consts if hasattr(sub, "consts")
                          else [read(v) for v in inner.constvars])
            outs = _eval_jaxpr_ew_dots(inner, sub_consts, *invals)
        else:
            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
            outs = eqn.primitive.bind(*subfuns, *invals, **bind_params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            write(v, o)
    return [read(v) for v in jaxpr.outvars]


def make_resident_smc_mutation(model, x, y, step, num_mutation_steps,
                               chain_block=4096, mutation="MALA",
                               base_log_pdf=None):
    """Build ``fn(seed, beta, theta0s [N, P]) -> (final [N, P], pot [N],
    acc_counts [N])``: ``num_mutation_steps`` MALA (or MH) moves per particle
    at the likelihood-tempered target prior * lik^beta, entirely on-chip.
    ``pot`` is the final per-particle log-likelihood (the next reweighting
    potential). ``beta`` is a traced scalar — no recompilation across stages.

    ``base_log_pdf``: for non-Bayesian targets (DistributionModel), the base
    distribution of the geometric path; the kernel then mutates
    base * (target/base)^beta with a generic per-lane traced vg instead of
    the extract_arch chain-lane math."""
    if mutation not in ("MALA", "MH"):
        raise ValueError(f"unsupported mutation {mutation!r} (MALA or MH)")
    with_grad = mutation == "MALA"
    P = model.num_params
    step = float(step)
    generic = base_log_pdf is not None

    if generic:
        # Pallas kernels cannot capture array constants (CLAUDE.md note) —
        # and a user's log-pdf closure freely CREATES them at every trace
        # (jnp.asarray([mu, 0.0]) etc), so closure_convert can't help
        # (re-tracing its pure function re-creates the constants). Instead
        # trace the vg ONCE to a jaxpr, hoist that jaxpr's constvars, ship
        # them as [1, size] VMEM inputs, and interpret the jaxpr in-kernel
        # with eval_jaxpr (the ops re-trace into the kernel; the constants
        # arrive as traced ref reads, never as captures).
        vg_closed = make_generic_vg(model, x, y, base_log_pdf, with_grad)
        example = jnp.zeros((model.num_params, chain_block), jnp.float32)
        vg_jaxpr = jax.make_jaxpr(lambda th: tuple(vg_closed(th)))(example)
        vg_consts = [np.asarray(c) for c in vg_jaxpr.consts]
        for c in vg_consts:
            if not np.issubdtype(c.dtype, np.floating):
                raise ValueError(
                    f"log-pdf closure captures a non-float constant "
                    f"(dtype {c.dtype}); the kernel ships constants as f32 "
                    "VMEM inputs — use floats or the scanned path")
        const_shapes = [c.shape for c in vg_consts]
        consts2d = [c.astype(np.float32).reshape(1, -1) for c in vg_consts]
        def pure_vg(th, *cs):
            return tuple(_eval_jaxpr_ew_dots(vg_jaxpr.jaxpr, list(cs), th))
    else:
        x_pad, y_pad, row_mask, loc, ivar, prior_const, temperature = prepare_data(model, x, y)
        if temperature != 1.0:
            raise ValueError("pass an untempered model; SMC applies the beta ladder")
        vg_math = make_vg(model, x_pad, y_pad, row_mask, loc, ivar, prior_const,
                          1.0, with_grad=with_grad, split=True)
        n_pad, d_in = x_pad.shape
        k_out = y_pad.shape[1]

    def kernel(seed_ref, beta_ref, theta_ref, x_ref, y_ref, mask_ref, loc_ref,
               ivar_ref, final_ref, pot_ref, acc_ref):
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)
        beta = beta_ref[0]

        xv = x_ref[:, :]
        yv = y_ref[:, :]
        maskv = mask_ref[:, :]
        locv = loc_ref[:, :]
        ivarv = ivar_ref[:, :]

        def vg(theta):
            return vg_math(theta, xv, yv, maskv, locv, ivarv)

        theta, ll, acc = _mutation_loop(vg, beta, theta_ref[:, :], step,
                                        num_mutation_steps, with_grad)
        final_ref[:, :] = theta
        pot_ref[:, :] = ll
        acc_ref[:, :] = acc

    def kernel_generic(seed_ref, beta_ref, theta_ref, *rest):
        n_c = len(vg_consts)
        const_refs = rest[:n_c]
        final_ref, pot_ref, acc_ref = rest[n_c:]
        i_blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i_blk)
        consts = [const_refs[i][:, :].reshape(const_shapes[i])
                  for i in range(n_c)]

        def vg(theta):
            return pure_vg(theta, *consts)

        theta, ll, acc = _mutation_loop(vg, beta_ref[0],
                                        theta_ref[:, :], step,
                                        num_mutation_steps, with_grad)
        final_ref[:, :] = theta
        pot_ref[:, :] = ll
        acc_ref[:, :] = acc

    def fn(seed, beta, theta0s):
        theta0s = jnp.asarray(theta0s, dtype=jnp.float32)
        N = theta0s.shape[0]
        if N % chain_block != 0:
            raise ValueError(f"{N} particles not a multiple of chain_block {chain_block}")
        num_blocks = N // chain_block
        theta_t = theta0s.T  # [P, N]

        tile_specs = dict(
            out_specs=[
                pl.BlockSpec((P, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((P, N), jnp.float32),
                jax.ShapeDtypeStruct((1, N), jnp.float32),
                jax.ShapeDtypeStruct((1, N), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the generic path's vmapped intermediates are batch-first
                # [cb, small]: lanes pad small->128, inflating scoped VMEM
                # (measured 29M at cb=4096); give it headroom
                vmem_limit_bytes=64 * 1024 * 1024 if generic else None,
            ),
        )
        if generic:
            final, pot, acc = pl.pallas_call(
                kernel_generic,
                grid=(num_blocks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((P, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                ] + [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for c in consts2d],
                **tile_specs,
            )(jnp.asarray([seed], jnp.int32), jnp.asarray([beta], jnp.float32),
              theta_t, *[jnp.asarray(c) for c in consts2d])
        else:
            final, pot, acc = pl.pallas_call(
                kernel,
                grid=(num_blocks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((P, chain_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_pad, d_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_pad, k_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                **tile_specs,
            )(jnp.asarray([seed], jnp.int32), jnp.asarray([beta], jnp.float32),
              theta_t, jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(row_mask),
              jnp.asarray(loc), jnp.asarray(ivar))
        return final.T, pot[0], acc[0]

    return fn


def make_resident_smc(model, x, y, num_particles, betas=None,
                      num_mutation_steps=2, mutation="MALA", mutation_step=0.1,
                      ess_threshold=0.5, chain_block=4096,
                      adaptive_target_ess=0.5, max_stages=50,
                      init_sampler=None, base_log_pdf=None):
    """Build ``runner(seed) -> (particles [N, P], log_weights [N],
    diagnostics)``: tempered SMC (samplers/smc.py semantics: prior *
    lik^beta path, ESS-triggered systematic resampling, evidence
    accumulation) with all mutation passes in the resident Pallas kernel.

    The WHOLE annealing pass — reweight, resample, kernel mutation — is one
    jitted ``lax.scan`` over the beta schedule (the Pallas call sits inside
    the scan body), so a run is a single device program: no per-stage host
    round-trips, which dominate wall-clock over a tunneled device link. The
    seed is a traced scalar, so the returned runner never retraces across
    calls. Diagnostics carry the per-stage keys of SMCSampler.run
    (+ ``log_evidence``, ``final_weight_ess``). TPU-only.

    ``betas="adaptive"`` switches the scan to a bounded while_loop whose
    next temperature comes from ESS bisection (SMCSampler._next_beta
    semantics): the mutation kernel already takes beta as a traced SMEM
    scalar, so one compiled kernel serves the dynamic ladder; diagnostics
    gain ``num_stages`` and are trimmed to the stages actually run.

    ``init_sampler``/``base_log_pdf``: for non-Bayesian targets
    (DistributionModel — SMCSampler's geometric path from an explicit base
    distribution): particle birth from ``init_sampler(key, n)``, potential
    = log_target - base, mutation via the generic per-lane traced vg.
    """
    adaptive = isinstance(betas, str) and betas == "adaptive"
    if not adaptive:
        if betas is None:
            betas = [(i / 10) ** 4 for i in range(0, 11)]
        betas = np.asarray(betas, dtype=np.float32)
    n = int(num_particles)
    x = np.asarray(x)
    y = np.asarray(y)
    generic = base_log_pdf is not None
    if generic and init_sampler is None:
        raise ValueError("non-Bayesian targets need init_sampler(key, n) "
                         "alongside base_log_pdf")

    mut = make_resident_smc_mutation(
        model, x, y, step=mutation_step, num_mutation_steps=num_mutation_steps,
        chain_block=chain_block, mutation=mutation, base_log_pdf=base_log_pdf)

    xj, yj = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)

    def stage(carry, inputs, force_resample=None):
        particles, pots, log_w, log_z, key = carry
        beta_prev, beta, stage_seed = inputs
        key, key_res = jax.random.split(key)

        # 1. reweight with the cached potentials (the kernel returned them)
        incr = (beta - beta_prev) * pots
        norm_prev = jax.nn.softmax(log_w)
        log_z = log_z + jax.scipy.special.logsumexp(jnp.log(norm_prev) + incr)
        log_w = log_w + incr

        # 2. ESS-triggered systematic resampling (gathers pots too);
        # adaptive stages ALSO resample when the bisection's ESS constraint
        # was binding (beta < 1) — the landed ESS sits marginally above the
        # threshold and the pure test never fires, stalling the ladder at
        # forced-minimum advances (samplers/smc.py _stage_core note)
        ess = jnp.exp(log_ess(log_w))
        do_resample = ess < ess_threshold * n
        if force_resample is not None:
            do_resample = do_resample | force_resample
        idx = systematic_resample_indices(key_res, jax.nn.softmax(log_w))
        particles = jnp.where(do_resample, particles[idx], particles)
        pots = jnp.where(do_resample, pots[idx], pots)
        log_w = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)
        unique_frac = jnp.where(
            do_resample,
            jnp.bincount(idx, length=n).astype(particles.dtype).clip(0, 1).mean(),
            jnp.ones((), dtype=particles.dtype))

        # 3. resident-kernel mutation at the new temperature
        particles, pots, acc = mut(stage_seed, beta, particles)

        out = {"beta": beta, "ess": ess, "resampled": do_resample,
               "mutation_acceptance": jnp.mean(acc) / num_mutation_steps,
               "unique_frac": unique_frac}
        return (particles, pots, log_w, log_z, key), out

    def next_beta(log_w, pots, beta_prev):
        """ESS-bisection next temperature (SMCSampler._next_beta algebra)."""
        target = jnp.float32(adaptive_target_ess * n)
        one = jnp.float32(1.0)

        def ess_at(b):
            return jnp.exp(log_ess(log_w + (b - beta_prev) * pots))

        full_ok = ess_at(one) >= target

        def body(_, c):
            lo, hi = c
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid))

        lo, _ = jax.lax.fori_loop(0, 30, body, (beta_prev, one))
        lo = jnp.maximum(lo, beta_prev + jnp.float32(1e-6))
        return jnp.where(full_ok, one, jnp.minimum(lo, one))

    def run(seed_val):
        key = jax.random.PRNGKey(seed_val)
        key_birth, key_stages = jax.random.split(key)
        if generic:
            particles = jnp.asarray(init_sampler(key_birth, n), jnp.float32)
            pots = jax.vmap(lambda t: model.log_target(t, xj, yj)
                            - base_log_pdf(t))(particles)
        else:
            keys = jax.random.split(key_birth, n)
            particles = jax.vmap(model.prior.sample)(keys).astype(jnp.float32)
            pots = jax.vmap(lambda t: model.log_lik(t, xj, yj))(particles)
        log_w = jnp.zeros(n, dtype=jnp.float32)
        log_z = jnp.zeros((), dtype=jnp.float32)
        if not adaptive:
            stage_seeds = seed_val + 7919 * jnp.arange(1, len(betas), dtype=jnp.int32)
            (particles, pots, log_w, log_z, _), diags = jax.lax.scan(
                stage, (particles, pots, log_w, log_z, key_stages),
                (jnp.asarray(betas[:-1]), jnp.asarray(betas[1:]), stage_seeds))
            return (particles, log_w, log_z, diags,
                    jnp.int32(len(betas) - 1), jnp.float32(betas[-1]))

        M = max_stages
        diags0 = {"beta": jnp.zeros(M, jnp.float32),
                  "ess": jnp.zeros(M, jnp.float32),
                  "resampled": jnp.zeros(M, bool),
                  "mutation_acceptance": jnp.zeros(M, jnp.float32),
                  "unique_frac": jnp.zeros(M, jnp.float32)}

        def cond(c):
            return (c["beta"] < 1.0) & (c["stage"] < M)

        def body(c):
            beta = next_beta(c["log_w"], c["pots"], c["beta"])
            stage_seed = seed_val + 7919 * (c["stage"] + 1)
            (particles, pots, log_w, log_z, key), out = stage(
                (c["particles"], c["pots"], c["log_w"], c["log_z"], c["key"]),
                (c["beta"], beta, stage_seed), force_resample=beta < 1.0)
            i = c["stage"]
            diags = {k: c["diags"][k].at[i].set(out[k]) for k in c["diags"]}
            return {"particles": particles, "pots": pots, "log_w": log_w,
                    "log_z": log_z, "key": key, "beta": beta,
                    "stage": i + 1, "diags": diags}

        out = jax.lax.while_loop(cond, body, {
            "particles": particles, "pots": pots, "log_w": log_w,
            "log_z": log_z, "key": key_stages,
            "beta": jnp.zeros((), jnp.float32),
            "stage": jnp.zeros((), jnp.int32), "diags": diags0,
        })
        return (out["particles"], out["log_w"], out["log_z"], out["diags"],
                out["stage"], out["beta"])

    jit_run = jax.jit(run)

    def runner(seed):
        particles, log_w, log_z, diags, num_stages, final_beta = jit_run(
            jnp.int32(seed))
        num_stages = int(num_stages)
        diagnostics = {k: np.asarray(v)[:num_stages] for k, v in diags.items()}
        if adaptive:
            diagnostics["num_stages"] = num_stages
            diagnostics["final_beta"] = float(final_beta)
            if num_stages >= max_stages and float(final_beta) < 1.0:
                import warnings
                warnings.warn(
                    f"adaptive resident SMC hit max_stages={max_stages} at "
                    f"beta={float(final_beta):.6f} < 1: the anneal is "
                    "TRUNCATED and log_evidence covers only the completed "
                    "ladder prefix", RuntimeWarning)
        diagnostics["log_evidence"] = float(log_z)
        diagnostics["final_weight_ess"] = float(jnp.exp(log_ess(log_w)))
        return particles, log_w, diagnostics

    return runner


def run_smc_resident(model, x, y, num_particles, betas=None,
                     num_mutation_steps=2, mutation="MALA", mutation_step=0.1,
                     ess_threshold=0.5, chain_block=4096, seed=0):
    """One-shot convenience around :func:`make_resident_smc` (builds the
    runner, runs it once). For repeated runs build the runner once."""
    return make_resident_smc(
        model, x, y, num_particles, betas=betas,
        num_mutation_steps=num_mutation_steps, mutation=mutation,
        mutation_step=mutation_step, ess_threshold=ess_threshold,
        chain_block=chain_block)(seed)
