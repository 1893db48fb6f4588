"""No-U-Turn Sampler (NUTS): dynamic-trajectory HMC, jit-compatible.

Beyond-reference capability: the reference ships HMC with a fixed trajectory
length plus the NUTS *init-step heuristic* (reference hmc.py:38-77) and the
NUTS *dual-averaging tuner* (reference hmcda_tuner.py:1-2, citing Hoffman &
Gelman's Algorithms 4-5) — but not the no-u-turn trajectory itself. This
module completes the family: multinomial NUTS (Hoffman & Gelman 2014;
Betancourt 2017's multinomial weighting) in the iterative, fixed-memory form
suitable for XLA (Phan & Pradhan, "Iterative NUTS"), so the whole transition
is `lax.while_loop`s with static-shape carries — vmappable over chains and
shardable over meshes like every other kernel here.

Algorithm shape:
- outer loop doubles the trajectory up to ``max_depth`` times, each doubling
  integrating ``2^j`` leapfrog steps in a uniformly random direction;
- within a subtree, U-turn checks against *every complete binary subtree*
  use a checkpoint stack of at most ``max_depth`` saved states: leaf ``n``
  (0-based) is stored at stack slot ``popcount(n)`` when ``n`` is even, and
  when ``n`` is odd it is checked against the contiguous slot range
  ``[popcount(n) - trailing_ones(n), popcount(n) - 1]`` — exactly the start
  leaves of the subtrees that end at ``n``;
- proposals are drawn progressively with multinomial (log-sum-exp) weights;
  merging a finished subtree into the trajectory uses Betancourt's biased
  progressive sampling, which favors the new subtree;
- a doubling whose subtree U-turns or diverges (log-joint drop > 1000) is
  discarded wholesale and ends the trajectory, as in Stan.

Momentum bookkeeping: subtrees are always integrated with a POSITIVE step
from the chosen trajectory end with locally-oriented momentum ``v * r_end``
(leapfrog with step -e equals negate-integrate-negate), so within-subtree
U-turn checks use raw leapfrog outputs; the finished end is installed back
with forward-time momentum ``v * rho_last``. The U-turn criterion
``dot(dtheta, r_left) < 0 or dot(dtheta, r_right) < 0`` is invariant under
simultaneous negation of dtheta and both momenta, which makes the local
checks exact for both directions.
"""

import math

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.samplers.hmc import HMC
from eeyore_tpu.tuners.dual_averaging import DualAveragingState, HMCDATuner

DIVERGENCE_THRESHOLD = 1000.0


def _popcount(n):
    return jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


def _trailing_ones(n):
    # n ^ (n+1) is a mask of the trailing-ones run plus the bit above it.
    return _popcount(jnp.bitwise_xor(n, n + 1)) - 1


def _is_uturn(dtheta, v_left, v_right):
    """Generalized U-turn criterion on VELOCITIES v = M^-1 r (reduces to the
    identity-mass momentum criterion when inv_mass is ones)."""
    return jnp.logical_or(jnp.dot(dtheta, v_left) < 0, jnp.dot(dtheta, v_right) < 0)


class NUTSState(NamedTuple):
    sample: jax.Array
    target_val: jax.Array
    grad_val: jax.Array
    accepted: jax.Array       # 1 if the returned sample moved off the previous one.
                              # NOTE: a different semantic from HMCState.accepted
                              # (Metropolis accept) — for like-for-like acceptance
                              # monitoring across kernels use ``accept_stat``,
                              # which IS the mean Metropolis statistic.
    accept_stat: jax.Array    # mean Metropolis stat over the trajectory (tuner input)
    depth: jax.Array          # tree depth USED: kept doublings only, as in
                              # Stan's treedepth (a discarded final subtree
                              # does not count) (int32)
    num_leapfrogs: jax.Array  # gradient evaluations spent this transition (int32)
    divergent: jax.Array      # 1 if the trajectory ended in a divergence (int32)
    step: jax.Array           # current leapfrog step size (tuner-dynamic)
    inv_mass: jax.Array       # diagonal of M^-1 (ones unless mass_adapt froze it)
    wf_mean: jax.Array        # Welford running mean of burn-in samples
    wf_m2: jax.Array          # Welford sum of squared deviations
    wf_n: jax.Array           # Welford count (int32)
    tuner: DualAveragingState


def choose_max_depth(model, data, step=0.1, num_warmup=256, num_chains=16,
                     quantile=0.95, probe_max_depth=10, tuner=None, key=None,
                     theta0s=None, dtype=None, mass_adapt=False,
                     return_metric=False, criterion="quantile",
                     candidate_depths=None):
    """Depth probe for fixed-budget NUTS: removes the hand-picked
    ``max_depth`` footgun (the 2^max_depth - 1 static budget pays for every
    level, so running the default 10 costs 1023 leapfrogs/transition when
    the target only ever uses 3).

    Runs ``num_warmup`` ADAPTIVE NUTS transitions over ``num_chains`` chains
    (tuner active for the first half), then freezes
    ``max_depth = ceil(quantile of kept tree depths)`` over the second half
    — kept depth is Stan's treedepth (``NUTSState.depth``: discarded final
    subtrees don't count), so the frozen budget covers ``quantile`` of the
    trajectories the adaptive sampler actually used.

    Returns ``(max_depth, tuned_step)``; feed both to
    ``NUTS(..., max_depth=d, fixed_budget=True, step=e)`` (or
    ``tuner=HMCDATuner(e0=e)`` to keep tuning) or to
    ``ops.resident_nuts_dense.make_resident_nuts_dense``.

    ``mass_adapt=True`` runs the probe with the Stan-style diagonal-metric
    warmup; with ``return_metric=True`` the return gains a third element,
    the chain-averaged FROZEN ``inv_mass`` diagonal ([P] f64) — feed it to
    the kernels' ``inv_mass=`` (the probe-and-freeze bridge that makes
    metric-needing targets kernel-eligible).

    ``criterion``: how the frozen depth is chosen from the probe.
    "quantile" (default) freezes the ``quantile`` of kept adaptive tree
    depths — trajectories keep their natural length, but per-sample ESS
    saturates well below the deep-tree budget on some posteriors.
    "ess" picks the depth maximizing measured ESS PER LEAPFROG over short
    fixed-budget probe runs at ``candidate_depths`` (default: 2 up to the
    quantile depth) — the kernels execute leapfrogs at a near-constant
    rate regardless of depth (143-160M/s measured on iris,
    benchmarks/NUTS_DEPTH_ESS.json), so ESS/leapfrog IS kernel ESS/s up
    to a constant. On iris this picks depth 2: 1.59M ESS/s vs the
    quantile choice's 0.62M (and resident HMC's 0.77M). Costs one extra
    scanned compile per candidate depth, once. (With ``mass_adapt`` the
    candidate probes score under the identity metric — the ranking is
    approximate for strongly metric-dependent posteriors; any choice
    remains statistically valid.)
    """
    from eeyore_tpu.datasets import as_schedule
    from eeyore_tpu.samplers.runner import run_fn

    if key is None:
        key = jax.random.PRNGKey(0)
    schedule = as_schedule(data)
    burnin = num_warmup // 2
    if tuner is None:
        tuner = HMCDATuner(d=0.8)
    kernel = NUTS(model, step=step, max_depth=probe_max_depth, tuner=tuner,
                  num_burnin_iters=burnin, mass_adapt=mass_adapt)
    kernel.recompute_current = schedule.num_batches != 1
    key_init, key_run = jax.random.split(key)
    if theta0s is None:
        keys = jax.random.split(key_init, num_chains)
        theta0s = jnp.stack([model.prior.sample(k) for k in keys])
    else:
        theta0s = jnp.asarray(theta0s)
        num_chains = theta0s.shape[0]
    if dtype is not None:
        theta0s = theta0s.astype(dtype)
    fn = jax.jit(jax.vmap(run_fn(kernel, schedule, num_warmup, burnin,
                                 ("depth",))))
    state, rec = fn(jax.random.split(key_run, num_chains), theta0s)
    import numpy as np
    depths = np.asarray(rec["depth"])        # [C, num_warmup - burnin]
    d = int(math.ceil(float(np.quantile(depths, quantile))))
    d = max(1, min(d, probe_max_depth))
    tuned_step = float(np.asarray(state.step).mean())

    if criterion == "ess":
        from eeyore_tpu.stats import multi_ess

        candidates = tuple(candidate_depths
                           or range(max(1, min(2, d)), d + 1))
        best_d, best_score = d, -1.0
        for cand in candidates:
            probe_k = NUTS(model, step=tuned_step, max_depth=cand,
                           fixed_budget=True, num_burnin_iters=burnin)
            probe_k.recompute_current = schedule.num_batches != 1
            fn = jax.jit(jax.vmap(run_fn(probe_k, schedule, num_warmup,
                                         burnin, ("sample",))))
            _, rec_c = fn(jax.random.split(jax.random.fold_in(key_run, cand),
                                           num_chains), theta0s)
            samples = np.asarray(rec_c["sample"], np.float64)
            ess = []
            for c in range(samples.shape[0]):
                try:
                    ess.append(multi_ess(samples[c], method="inse"))
                except RuntimeError:
                    pass
            if not ess:
                continue
            score = float(np.mean(ess)) / (2 ** cand - 1)  # ESS/leapfrog
            if score > best_score:
                best_d, best_score = cand, score
        d = best_d
    elif criterion != "quantile":
        raise ValueError(f"criterion must be 'quantile' or 'ess', got "
                         f"{criterion!r}")

    if return_metric:
        inv_mass = np.asarray(state.inv_mass, np.float64).mean(axis=0)
        return d, tuned_step, inv_mass
    return d, tuned_step


class NUTS(HMC):
    """No-U-Turn kernel. ``step`` is the leapfrog step size; the trajectory
    length is chosen per transition by the no-u-turn criterion, up to
    ``2^max_depth - 1`` leapfrog steps. Dual-averaging tuning reuses
    :class:`HMCDATuner` on the trajectory-mean Metropolis statistic; construct
    it WITHOUT a trajectory length (``HMCDATuner()``) — NUTS chooses its own
    trajectory lengths, so the tuner's ``l``/num_steps rule is unused."""

    state_keys = ("sample", "target_val", "grad_val", "accepted", "accept_stat",
                  "depth", "num_leapfrogs", "divergent")
    needs_iteration = True

    def __init__(self, model, step=0.1, max_depth=10, tuner=None,
                 num_burnin_iters=0, recompute_current=False, mass_adapt=False,
                 fixed_budget=False):
        super().__init__(model, step=step, num_steps=1, tuner=tuner,
                         num_burnin_iters=num_burnin_iters,
                         recompute_current=recompute_current)
        # max_depth="auto": the budget is chosen by running the
        # choose_max_depth warmup probe against the actual data the first
        # time the kernel runs (runner.py calls resolve_auto_budget) —
        # the reference's precedent of warmup heuristics living inside the
        # sampler (reference hmc.py:38-77 init_step). The probed
        # (depth, tuned step) freeze onto the kernel, and the kernel
        # becomes eligible for FIXED-BUDGET dispatch (fixed-budget and
        # adaptive NUTS draw bit-identical samples at equal max_depth, so
        # the only semantic change is the probed depth cap itself).
        self.auto_depth = isinstance(max_depth, str) and max_depth == "auto"
        self._auto_fingerprint = None
        self._frozen_inv_mass = None  # set by resolve_auto_budget(mass_adapt)
        self.max_depth = 10 if self.auto_depth else int(max_depth)
        # Stan-style diagonal metric warmup: Welford-estimate the posterior
        # variances over the second quarter of burn-in, freeze
        # M^-1 = regularized var at mid-burn-in (the remaining half re-tunes
        # the step size against the new metric via a dual-averaging warm
        # restart). Needs num_burnin_iters >= 20 to engage.
        self.mass_adapt = bool(mass_adapt)
        # Fixed-budget transitions: every transition executes exactly
        # 2^max_depth - 1 leapfrogs as STATIC control flow (unrolled
        # doublings + fori_loop subtrees) with per-leaf masking that
        # reproduces the adaptive builder's early-stopping algebra. Under
        # vmap the adaptive while_loops run in lockstep — every chain pays
        # for the deepest chain's tree (the measured ~190x penalty at 32k
        # chains, benchmarks/NUTS_RESULTS.json); the fixed-budget form pays
        # 2^max_depth - 1 ALWAYS but never more, so a small max_depth (3-5)
        # recovers HMC-class throughput. Given the same keys it draws
        # IDENTICAL samples to the adaptive form at equal max_depth
        # (tests/test_nuts.py pins this).
        self.fixed_budget = bool(fixed_budget)

    def resolve_auto_budget(self, data, key=None, num_warmup=256,
                            num_chains=16, quantile=0.95, theta0s=None,
                            probe_max_depth=4, criterion="ess"):
        """Resolve ``max_depth="auto"``: run the :func:`choose_max_depth`
        warmup probe ONCE per dataset and freeze the probed (depth, step)
        onto this kernel. Idempotent per data fingerprint; no-op for
        explicit depths. The runner calls this before any trace/dispatch,
        passing the run's own ``theta0s`` (required for prior-less
        DistributionModel targets; otherwise inits draw from the prior).

        ``probe_max_depth`` caps the probe's trees (Stan's max_treedepth
        role): the dual averager tunes the step AGAINST the cap, so the
        frozen budget is self-consistent with how the capped sampler
        actually moved. The default 4 keeps the frozen kernel inside the
        validated unroll regime (dispatch.MAX_KERNEL_DEPTH) — an uncapped
        probe on a hard posterior happily returns depth 7+ (127+
        leapfrogs/transition), which compiles for tens of minutes and
        buys ~2x less ESS/s than the capped budget's larger step.

        ``criterion`` defaults to "ess" here (unlike choose_max_depth):
        the auto flow's goal IS throughput, and ESS-per-leapfrog picked
        the measured ESS/s-optimal depth on every validated target (iris:
        1.9x the quantile choice; XOR and banknotes: identical —
        benchmarks/NUTS_DEPTH_ESS.json) for a few extra seconds of
        scanned probe runs in the one-time warmup."""
        if not self.auto_depth:
            return
        from eeyore_tpu.datasets import as_schedule

        schedule = as_schedule(data)
        import numpy as _np
        xb = _np.asarray(schedule.x[0])
        yb = _np.asarray(schedule.y[0])
        fp = (xb.shape, hash(xb.tobytes()), yb.shape, hash(yb.tobytes()))
        if fp == self._auto_fingerprint:
            return
        if key is None:
            key = jax.random.PRNGKey(0)
        if theta0s is None and not hasattr(self.model, "prior"):
            raise ValueError(
                "max_depth='auto' on a prior-less model needs probe inits: "
                "pass theta0s to resolve_auto_budget (the samplers' runners "
                "forward the run's own theta0s automatically)")
        if theta0s is not None:
            theta0s = jnp.asarray(theta0s)[:num_chains]
        out = choose_max_depth(
            self.model, schedule, step=self.step0, num_warmup=num_warmup,
            num_chains=num_chains, quantile=quantile, theta0s=theta0s,
            probe_max_depth=probe_max_depth, criterion=criterion,
            key=jax.random.fold_in(key, 7919), mass_adapt=self.mass_adapt,
            return_metric=self.mass_adapt)
        if self.mass_adapt:
            d, e, inv_mass = out
            # probe-and-freeze: the kernels take the frozen diagonal as
            # static constants; the scanned fallback keeps live mass_adapt
            self._frozen_inv_mass = inv_mass
        else:
            d, e = out
        self.max_depth = d
        self.step0 = e
        if self.tuner is not None and self.tuner.e0 is None:
            # warm-start the dual averager at the probed step instead of
            # re-running find_initial_step
            self.tuner.e0 = e
        self._auto_fingerprint = fp
        # stale-trace safety: the scanned jit cache baked the OLD depth
        self._jit_cache = {}
        self._backend_cache = {}

    def init(self, theta, x, y, key=None):
        theta = jnp.asarray(theta)
        target, grad = self.upto_grad_log_target(theta, x, y)
        dtype = theta.dtype

        step = self.step0
        if self.tuner is not None:
            if self.tuner.e0 is not None:
                step = self.tuner.e0
            elif key is not None:
                step = self.find_initial_step(key, theta, x, y)
                if self.tuner.eub is not None:
                    step = jnp.minimum(step, self.tuner.eub)
            tuner_state = self.tuner.init(step, dtype=dtype)
        else:
            tuner_state = HMCDATuner(l=1.0).init(step, dtype=dtype)  # inert placeholder

        zero_i = jnp.zeros((), jnp.int32)
        return NUTSState(
            sample=theta, target_val=target, grad_val=grad,
            accepted=zero_i, accept_stat=jnp.zeros((), dtype), depth=zero_i,
            num_leapfrogs=zero_i, divergent=zero_i,
            step=jnp.asarray(step, dtype=dtype),
            inv_mass=jnp.ones_like(theta),
            wf_mean=jnp.zeros_like(theta), wf_m2=jnp.zeros_like(theta),
            wf_n=zero_i,
            tuner=tuner_state,
        )

    # ---- one leapfrog step (shared with HMC's integrator semantics) ----

    def _leapfrog_one(self, theta, rho, grad, step, inv_mass, x, y):
        rho = rho + 0.5 * step * grad
        theta = theta + step * (inv_mass * rho)  # position moves at velocity M^-1 rho
        target, grad = self.upto_grad_log_target(theta, x, y)
        rho = rho + 0.5 * step * grad
        return theta, rho, target, grad

    # ---- subtree of 2^depth leapfrog steps with checkpointed U-turn checks ----

    def _build_subtree(self, key, depth, theta0, rho0, grad0, step, inv_mass, logp0, x, y):
        """Integrate ``2^depth`` steps from (theta0, rho0). Returns the last
        leaf (new trajectory end, local orientation), the multinomial
        proposal drawn from the subtree, the subtree log-weight (relative to
        logp0), accumulated Metropolis stats, and turning/divergence flags."""
        p = theta0.shape[0]
        dtype = theta0.dtype
        num_leaves = jnp.asarray(1, jnp.int32) << depth
        # A subtree never exceeds 2^(max_depth-1) leaves, so even-leaf store
        # slots max out at popcount <= max_depth-2; one extra row parks the
        # writes of odd leaves -> max_depth rows total.
        num_slots = self.max_depth - 1
        ckpt_theta = jnp.zeros((num_slots + 1, p), dtype)
        ckpt_rho = jnp.zeros((num_slots + 1, p), dtype)
        neg_inf = jnp.asarray(-jnp.inf, dtype)

        def cond(c):
            n = c["n"]
            return (n < num_leaves) & jnp.logical_not(c["turning"] | c["diverging"])

        def body(c):
            n = c["n"]
            theta, rho, target, grad = self._leapfrog_one(
                c["theta"], c["rho"], c["grad"], step, inv_mass, x, y)
            logp = target - 0.5 * jnp.dot(rho, inv_mass * rho)
            w = logp - logp0  # log weight relative to the trajectory start
            diverging = jnp.logical_not(w > -DIVERGENCE_THRESHOLD)  # catches NaN too
            alpha = jnp.minimum(jnp.exp(w), 1.0)
            alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)

            # progressive multinomial draw within the subtree
            new_lse = jnp.logaddexp(c["lse"], w)
            u = jax.random.uniform(jax.random.fold_in(key, n), dtype=dtype)
            take = jnp.log(u) < w - new_lse
            prop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b),
                (theta, target, grad), c["prop"])

            # checkpoint-stack U-turn checks against complete subtrees
            pc = _popcount(n)
            even = (n % 2) == 0
            store_idx = jnp.where(even, pc, num_slots)  # parked row when odd
            ckpt_t = c["ckpt_theta"].at[store_idx].set(
                jnp.where(even, theta, c["ckpt_theta"][store_idx]))
            ckpt_r = c["ckpt_rho"].at[store_idx].set(
                jnp.where(even, rho, c["ckpt_rho"][store_idx]))
            idx_max = pc - 1
            idx_min = pc - _trailing_ones(n)

            def check(i, turning):
                active = jnp.logical_not(even) & (i >= idx_min) & (i <= idx_max)
                turn_i = _is_uturn(theta - ckpt_t[i], inv_mass * ckpt_r[i], inv_mass * rho)
                return turning | (active & turn_i)

            turning = jax.lax.fori_loop(0, num_slots, check, c["turning"])

            return {
                "n": n + 1, "theta": theta, "rho": rho, "target": target,
                "grad": grad, "lse": new_lse, "prop": prop,
                "sum_alpha": c["sum_alpha"] + alpha, "num_alpha": c["num_alpha"] + 1,
                "ckpt_theta": ckpt_t, "ckpt_rho": ckpt_r,
                "turning": turning, "diverging": diverging,
            }

        out = jax.lax.while_loop(cond, body, {
            "n": jnp.zeros((), jnp.int32), "theta": theta0, "rho": rho0,
            "target": jnp.zeros((), dtype),  # placeholder; first leaf overwrites
            "grad": grad0, "lse": neg_inf,
            "prop": (theta0, jnp.zeros((), dtype), grad0),
            "sum_alpha": jnp.zeros((), dtype), "num_alpha": jnp.zeros((), jnp.int32),
            "ckpt_theta": ckpt_theta, "ckpt_rho": ckpt_rho,
            "turning": jnp.zeros((), bool), "diverging": jnp.zeros((), bool),
        })
        return out

    # ---- fixed-budget subtree: static 2^depth leapfrogs, masked algebra ----

    def _build_subtree_fixed(self, key, depth, theta0, rho0, grad0, step,
                             inv_mass, logp0, x, y):
        """Same contract as ``_build_subtree`` with a STATIC trip count
        (``depth`` is a python int): all ``2**depth`` leapfrogs execute;
        after an internal stop (turning/divergence) further leaves stop
        contributing — weights forced to -inf, stats and flags gated — so
        the returned pytree equals the adaptive builder's (the final end
        state is only consumed when the subtree is good, in which case all
        leaves ran anyway). Key fold-in matches the adaptive builder
        leaf-for-leaf, so draws are bit-identical."""
        p = theta0.shape[0]
        dtype = theta0.dtype
        num_slots = self.max_depth - 1
        ckpt_theta = jnp.zeros((num_slots + 1, p), dtype)
        ckpt_rho = jnp.zeros((num_slots + 1, p), dtype)
        neg_inf = jnp.asarray(-jnp.inf, dtype)

        def body(n, c):
            live = jnp.logical_not(c["turning"] | c["diverging"])
            theta, rho, target, grad = self._leapfrog_one(
                c["theta"], c["rho"], c["grad"], step, inv_mass, x, y)
            logp = target - 0.5 * jnp.dot(rho, inv_mass * rho)
            w = logp - logp0
            leaf_div = jnp.logical_not(w > -DIVERGENCE_THRESHOLD)
            alpha = jnp.minimum(jnp.exp(w), 1.0)
            alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)

            w_eff = jnp.where(live, w, neg_inf)
            new_lse = jnp.logaddexp(c["lse"], w_eff)
            u = jax.random.uniform(jax.random.fold_in(key, n), dtype=dtype)
            take = live & (jnp.log(u) < w_eff - new_lse)
            prop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b),
                (theta, target, grad), c["prop"])

            pc = _popcount(n)
            even = (n % 2) == 0
            store_idx = jnp.where(even, pc, num_slots)
            ckpt_t = c["ckpt_theta"].at[store_idx].set(
                jnp.where(even, theta, c["ckpt_theta"][store_idx]))
            ckpt_r = c["ckpt_rho"].at[store_idx].set(
                jnp.where(even, rho, c["ckpt_rho"][store_idx]))
            idx_max = pc - 1
            idx_min = pc - _trailing_ones(n)

            def check(i, turning):
                active = jnp.logical_not(even) & (i >= idx_min) & (i <= idx_max)
                turn_i = _is_uturn(theta - ckpt_t[i], inv_mass * ckpt_r[i], inv_mass * rho)
                return turning | (active & turn_i)

            found_turn = jax.lax.fori_loop(0, num_slots, check,
                                           jnp.zeros((), bool))

            return {
                "theta": theta, "rho": rho, "target": target,
                "grad": grad, "lse": new_lse, "prop": prop,
                "sum_alpha": c["sum_alpha"] + jnp.where(live, alpha, 0.0),
                "num_alpha": c["num_alpha"] + jnp.where(live,
                                                        jnp.int32(1),
                                                        jnp.int32(0)),
                "ckpt_theta": ckpt_t, "ckpt_rho": ckpt_r,
                "turning": c["turning"] | (live & found_turn),
                "diverging": c["diverging"] | (live & leaf_div),
            }

        return jax.lax.fori_loop(0, 2 ** depth, body, {
            "theta": theta0, "rho": rho0,
            "target": jnp.zeros((), dtype),
            "grad": grad0, "lse": neg_inf,
            "prop": (theta0, jnp.zeros((), dtype), grad0),
            "sum_alpha": jnp.zeros((), dtype), "num_alpha": jnp.zeros((), jnp.int32),
            "ckpt_theta": ckpt_theta, "ckpt_rho": ckpt_rho,
            "turning": jnp.zeros((), bool), "diverging": jnp.zeros((), bool),
        })

    def _tree_fixed(self, key_tree, state, current_target, current_grad,
                    rho0, logp0, step, inv_mass, x, y):
        """Fixed-budget trajectory: the doubling loop unrolled over
        ``max_depth`` levels with every level's merge algebra gated by the
        pre-level live flag — level-for-level identical to the adaptive
        while_loop, at exactly ``2^max_depth - 1`` leapfrogs."""
        dtype = state.sample.dtype
        c = {
            "kept_depth": jnp.zeros((), jnp.int32),
            "theta_l": state.sample, "r_l": rho0, "grad_l": current_grad,
            "theta_r": state.sample, "r_r": rho0, "grad_r": current_grad,
            "prop": (state.sample, current_target, current_grad),
            "lse": jnp.zeros((), dtype),
            "sum_alpha": jnp.zeros((), dtype), "num_alpha": jnp.zeros((), jnp.int32),
            "turning": jnp.zeros((), bool), "diverging": jnp.zeros((), bool),
        }
        for depth in range(self.max_depth):
            kd = jax.random.fold_in(key_tree, depth)
            k_dir, k_sub, k_merge = jax.random.split(kd, 3)
            active = jnp.logical_not(c["turning"] | c["diverging"])
            v = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0).astype(dtype)
            go_right = v > 0

            end_theta = jnp.where(go_right, c["theta_r"], c["theta_l"])
            end_r = jnp.where(go_right, c["r_r"], c["r_l"])
            end_grad = jnp.where(go_right, c["grad_r"], c["grad_l"])

            sub = self._build_subtree_fixed(
                k_sub, depth, end_theta, v * end_r, end_grad, step, inv_mass,
                logp0, x, y)

            bad = sub["turning"] | sub["diverging"]
            sum_alpha = c["sum_alpha"] + jnp.where(active, sub["sum_alpha"], 0.0)
            num_alpha = c["num_alpha"] + jnp.where(active, sub["num_alpha"], 0)

            accept_log_prob = jnp.minimum(sub["lse"] - c["lse"], 0.0)
            u = jax.random.uniform(k_merge, dtype=dtype)
            take = active & jnp.logical_not(bad) & (jnp.log(u) < accept_log_prob)
            prop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), sub["prop"], c["prop"])
            ok = active & jnp.logical_not(bad)
            lse = jnp.where(ok, jnp.logaddexp(c["lse"], sub["lse"]), c["lse"])

            new_end = (sub["theta"], v * sub["rho"], sub["grad"])
            theta_r = jnp.where(ok & go_right, new_end[0], c["theta_r"])
            r_r = jnp.where(ok & go_right, new_end[1], c["r_r"])
            grad_r = jnp.where(ok & go_right, new_end[2], c["grad_r"])
            theta_l = jnp.where(ok & ~go_right, new_end[0], c["theta_l"])
            r_l = jnp.where(ok & ~go_right, new_end[1], c["r_l"])
            grad_l = jnp.where(ok & ~go_right, new_end[2], c["grad_l"])

            dtheta = theta_r - theta_l
            whole_turn = ok & _is_uturn(dtheta, inv_mass * r_l, inv_mass * r_r)
            turning = c["turning"] | (active & (bad | whole_turn))
            diverging = c["diverging"] | (active & sub["diverging"])

            c = {
                "kept_depth": jnp.where(ok, jnp.asarray(depth + 1, jnp.int32),
                                        c["kept_depth"]),
                "theta_l": theta_l, "r_l": r_l, "grad_l": grad_l,
                "theta_r": theta_r, "r_r": r_r, "grad_r": grad_r,
                "prop": prop, "lse": lse,
                "sum_alpha": sum_alpha, "num_alpha": num_alpha,
                "turning": turning, "diverging": diverging,
            }
        return c

    # ---- one NUTS transition ----

    def step_fn(self, key, state, x, y, iteration):
        key_mom, key_tree = jax.random.split(key)
        dtype = state.sample.dtype

        if self.recompute_current:
            current_target, current_grad = self.upto_grad_log_target(state.sample, x, y)
        else:
            current_target, current_grad = state.target_val, state.grad_val

        inv_mass = state.inv_mass
        z = jax.random.normal(key_mom, state.sample.shape, dtype=dtype)
        rho0 = z * jax.lax.rsqrt(inv_mass)  # rho ~ N(0, M), M = diag(1/inv_mass)
        logp0 = current_target - 0.5 * jnp.dot(rho0, inv_mass * rho0)
        step = state.step

        def cond(c):
            return (c["depth"] < self.max_depth) & jnp.logical_not(
                c["turning"] | c["diverging"])

        def body(c):
            kd = jax.random.fold_in(key_tree, c["depth"])
            k_dir, k_sub, k_merge = jax.random.split(kd, 3)
            v = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0).astype(dtype)
            go_right = v > 0

            end_theta = jnp.where(go_right, c["theta_r"], c["theta_l"])
            end_r = jnp.where(go_right, c["r_r"], c["r_l"])
            end_grad = jnp.where(go_right, c["grad_r"], c["grad_l"])

            sub = self._build_subtree(
                k_sub, c["depth"], end_theta, v * end_r, end_grad, step, inv_mass,
                logp0, x, y)

            bad = sub["turning"] | sub["diverging"]
            # Metropolis stats accumulate over every computed leapfrog step
            sum_alpha = c["sum_alpha"] + sub["sum_alpha"]
            num_alpha = c["num_alpha"] + sub["num_alpha"]

            # biased progressive merge (only when the subtree is valid)
            accept_log_prob = jnp.minimum(sub["lse"] - c["lse"], 0.0)
            u = jax.random.uniform(k_merge, dtype=dtype)
            take = jnp.logical_not(bad) & (jnp.log(u) < accept_log_prob)
            prop = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), sub["prop"], c["prop"])
            lse = jnp.where(bad, c["lse"], jnp.logaddexp(c["lse"], sub["lse"]))

            # install the new trajectory end (forward-time momentum v * rho)
            ok = jnp.logical_not(bad)
            new_end = (sub["theta"], v * sub["rho"], sub["grad"])
            theta_r = jnp.where(ok & go_right, new_end[0], c["theta_r"])
            r_r = jnp.where(ok & go_right, new_end[1], c["r_r"])
            grad_r = jnp.where(ok & go_right, new_end[2], c["grad_r"])
            theta_l = jnp.where(ok & ~go_right, new_end[0], c["theta_l"])
            r_l = jnp.where(ok & ~go_right, new_end[1], c["r_l"])
            grad_l = jnp.where(ok & ~go_right, new_end[2], c["grad_l"])

            # whole-trajectory U-turn check after a successful doubling
            dtheta = theta_r - theta_l
            turning = bad | (ok & _is_uturn(dtheta, inv_mass * r_l, inv_mass * r_r))

            return {
                "depth": c["depth"] + 1,
                # Stan-style treedepth: count only KEPT doublings — a subtree
                # that U-turned or diverged was discarded wholesale.
                "kept_depth": jnp.where(bad, c["kept_depth"], c["depth"] + 1),
                "theta_l": theta_l, "r_l": r_l, "grad_l": grad_l,
                "theta_r": theta_r, "r_r": r_r, "grad_r": grad_r,
                "prop": prop, "lse": lse,
                "sum_alpha": sum_alpha, "num_alpha": num_alpha,
                "turning": turning, "diverging": c["diverging"] | sub["diverging"],
            }

        if self.fixed_budget:
            tree = self._tree_fixed(key_tree, state, current_target,
                                    current_grad, rho0, logp0, step, inv_mass,
                                    x, y)
        else:
            tree = jax.lax.while_loop(cond, body, {
                "depth": jnp.zeros((), jnp.int32),
                "kept_depth": jnp.zeros((), jnp.int32),
                "theta_l": state.sample, "r_l": rho0, "grad_l": current_grad,
                "theta_r": state.sample, "r_r": rho0, "grad_r": current_grad,
                # the start state enters the multinomial pool with weight exp(0)
                "prop": (state.sample, current_target, current_grad),
                "lse": jnp.zeros((), dtype),
                "sum_alpha": jnp.zeros((), dtype), "num_alpha": jnp.zeros((), jnp.int32),
                "turning": jnp.zeros((), bool), "diverging": jnp.zeros((), bool),
            })

        new_sample, new_target, new_grad = tree["prop"]
        accepted = jnp.any(new_sample != state.sample).astype(jnp.int32)
        accept_stat = tree["sum_alpha"] / jnp.maximum(tree["num_alpha"], 1).astype(dtype)

        if self.tuner is not None and self.num_burnin_iters > 0:
            tune_now = iteration < self.num_burnin_iters
            return_e = iteration != self.num_burnin_iters - 1
            tuner_state, e, _ = self.tuner.tune(state.tuner, accept_stat, iteration, return_e)
            new_tuner = jax.tree_util.tree_map(
                lambda new, old: jnp.where(tune_now, new, old), tuner_state, state.tuner)
            new_step = jnp.where(tune_now, e, state.step)
        else:
            new_tuner, new_step = state.tuner, state.step

        # ---- diagonal metric warmup (Welford over burn-in samples) ----
        new_inv_mass = state.inv_mass
        wf_mean, wf_m2, wf_n = state.wf_mean, state.wf_m2, state.wf_n
        if self.mass_adapt and self.num_burnin_iters >= 20:
            warm_start = self.num_burnin_iters // 4
            freeze_at = self.num_burnin_iters // 2
            in_window = (iteration >= warm_start) & (iteration < freeze_at)
            n_new = wf_n + 1
            delta = new_sample - wf_mean
            mean_upd = wf_mean + delta / n_new.astype(dtype)
            m2_upd = wf_m2 + delta * (new_sample - mean_upd)
            wf_mean = jnp.where(in_window, mean_upd, wf_mean)
            wf_m2 = jnp.where(in_window, m2_upd, wf_m2)
            wf_n = jnp.where(in_window, n_new, wf_n)

            at_freeze = iteration == freeze_at - 1
            n_f = jnp.maximum(wf_n, 2).astype(dtype)
            var = wf_m2 / (n_f - 1.0)
            # Stan's shrinkage toward unit metric for short windows
            var_reg = (n_f / (n_f + 5.0)) * var + 1e-3 * (5.0 / (n_f + 5.0))
            usable = at_freeze & (wf_n > 1)
            new_inv_mass = jnp.where(usable, jnp.maximum(var_reg, 1e-10), new_inv_mass)
            if self.tuner is not None:
                # dual-averaging warm restart against the new metric: the
                # remaining half of burn-in re-tunes the step from its
                # current value
                fresh = self.tuner.init(new_step, dtype=dtype)
                new_tuner = jax.tree_util.tree_map(
                    lambda f, old: jnp.where(usable, f, old), fresh, new_tuner)

        new_state = NUTSState(
            sample=new_sample, target_val=new_target, grad_val=new_grad,
            accepted=accepted, accept_stat=accept_stat, depth=tree["kept_depth"],
            num_leapfrogs=tree["num_alpha"],
            divergent=tree["diverging"].astype(jnp.int32),
            step=new_step, inv_mass=new_inv_mass,
            wf_mean=wf_mean, wf_m2=wf_m2, wf_n=wf_n,
            tuner=new_tuner,
        )
        info = {k: getattr(new_state, k) for k in self.state_keys}
        return new_state, info
