"""Tempered Sequential Monte Carlo with systematic resampling.

The north-star extension of the reference's power-posterior sampler
(SURVEY.md section 2.2 note): the reference anneals a FIXED ladder of chains
with swap moves; SMC instead moves a population of 10k+ particles through the
tempering schedule with importance reweighting, ESS-triggered systematic
resampling, and MCMC mutation moves (MALA/MH/HMC kernels at the current
temperature).

Tempering path: pi_beta ~ prior * lik^beta (beta: 0 -> 1), so beta=0 is the
prior the particles are born from. (The reference's ladder tempers the WHOLE
target, (prior*lik)^beta, which has no proper base measure at beta=0 — for
SMC the standard likelihood-tempered path is used; at beta=1 both coincide
with the posterior.) For DistributionModel targets (no prior/lik split),
``init_sampler`` supplies the base distribution and the whole log-pdf is
tempered.

Everything is one jitted scan over the beta schedule; per-particle work is
vmapped; the multi-device variant shards the particle axis (see
eeyore_tpu.parallel.sharded_smc).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eeyore_tpu.models.model import BayesianModel


class SMCState(NamedTuple):
    particles: jax.Array    # [N, p]
    log_weights: jax.Array  # [N] (unnormalized)
    log_lik: jax.Array      # [N] cached tempering potential per particle
    beta: jax.Array
    ess: jax.Array
    unique_frac: jax.Array  # fraction surviving last resample


def systematic_resample_indices(key, norm_weights):
    """Systematic resampling: one uniform, N stratified positions against the
    weight CDF. O(N) with a single cumsum + searchsorted — TPU-friendly."""
    n = norm_weights.shape[0]
    u = jax.random.uniform(key, dtype=norm_weights.dtype)
    positions = (u + jnp.arange(n, dtype=norm_weights.dtype)) / n
    cdf = jnp.cumsum(norm_weights)
    cdf = cdf / cdf[-1]
    return jnp.searchsorted(cdf, positions, side="left").astype(jnp.int32)


def log_ess(log_weights):
    """log ESS = 2 logsumexp(w) - logsumexp(2w)."""
    return 2.0 * jax.scipy.special.logsumexp(log_weights) - jax.scipy.special.logsumexp(2.0 * log_weights)


class SMCSampler:
    def __init__(self, model, num_particles, betas=None, num_mutation_steps=2,
                 mutation="MALA", mutation_step=0.1, ess_threshold=0.5,
                 init_sampler=None, base_log_pdf=None,
                 adaptive_target_ess=0.5, max_stages=50):
        """``betas``: increasing schedule ending at 1.0 (default: the
        reference's quartic ladder (i/N)^4 with N=10 rungs, prepended with 0),
        or the string ``"adaptive"`` to choose each next temperature by ESS
        bisection: the largest ``b`` with
        ``ESS(log_w + (b - b_prev) * potential) >= adaptive_target_ess * N``
        (standard adaptive tempering; jumps straight to 1 when allowed), with
        at most ``max_stages`` stages. Adaptive schedules concentrate stages
        where the tempering path actually bends — typically several-fold
        fewer stages than the reference's fixed quartic ladder at equal
        evidence quality.

        ``mutation``: 'MALA' or 'MH'. ``ess_threshold``: resample when
        ESS < threshold * N."""
        self.model = model
        self.num_particles = num_particles
        self.adaptive = isinstance(betas, str) and betas == "adaptive"
        if self.adaptive:
            self.betas = None
        else:
            if betas is None:
                betas = [(i / 10) ** 4 for i in range(0, 11)]
            self.betas = jnp.asarray(betas)
        self.adaptive_target_ess = float(adaptive_target_ess)
        self.max_stages = int(max_stages)
        self.num_mutation_steps = num_mutation_steps
        self.mutation = mutation
        self.mutation_step = mutation_step
        self.ess_threshold = ess_threshold

        self._is_bayesian = isinstance(model, BayesianModel)
        if not self._is_bayesian and (init_sampler is None or base_log_pdf is None):
            raise ValueError("non-Bayesian targets need init_sampler(key, n) and base_log_pdf")
        self.init_sampler = init_sampler
        self.base_log_pdf = base_log_pdf

    def _cached_jit(self, tag, data, run_fn):
        """Per-sampler jit cache: repeated runs over the same data objects
        reuse the compiled anneal instead of retracing the whole
        stage-scan closure every call (the data arrays are baked into the
        trace as constants — keyed on their identity, held alive)."""
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        cache_key = (tag, id(data[0]), id(data[1]))
        hit = cache.get(cache_key)
        if hit is not None and hit[1] is data[0] and hit[2] is data[1]:
            return hit[0]
        fn = jax.jit(run_fn)
        cache[cache_key] = (fn, data[0], data[1])
        return fn

    # ---- tempered target pieces ----

    def _potential(self, theta, x, y):
        """The tempered increment U in log pi_beta = base + beta * U:
        log_lik for Bayesian models (prior * lik^beta path); for raw
        log-density targets, the geometric path from the init distribution:
        (1-beta) log q + beta log pi = log q + beta (log pi - log q)."""
        if self._is_bayesian:
            return self.model.log_lik(theta, x, y)
        return self.model.log_target(theta, x, y) - self.base_log_pdf(theta)

    def _base(self, theta):
        """The beta-independent part: log_prior / base log-pdf."""
        if self._is_bayesian:
            return self.model.log_prior(theta)
        return self.base_log_pdf(theta)

    def _tempered_target(self, theta, beta, x, y):
        return self._base(theta) + beta * self._potential(theta, x, y)

    # ---- particle birth ----

    def _sample_init(self, key):
        if self._is_bayesian:
            keys = jax.random.split(key, self.num_particles)
            return jax.vmap(self.model.prior.sample)(keys)
        return self.init_sampler(key, self.num_particles)

    # ---- mutation kernel: num_mutation_steps of MALA/MH at fixed beta ----

    def _mutate(self, key, particles, beta, x, y):
        step = self.mutation_step

        def target(theta):
            return self._tempered_target(theta, beta, x, y)

        def one_mala(key, theta):
            def body(carry, k):
                theta, tv, gv = carry
                k1, k2 = jax.random.split(k)
                mean = theta + 0.5 * step * gv
                prop = mean + jnp.sqrt(step) * jax.random.normal(k1, theta.shape, dtype=theta.dtype)
                ptv, pgv = jax.value_and_grad(target)(prop)
                rev_mean = prop + 0.5 * step * pgv

                def lp(v, loc):
                    z = (v - loc) / jnp.sqrt(step)
                    return jnp.sum(-0.5 * z * z)

                log_rate = ptv - tv - lp(prop, mean) + lp(theta, rev_mean)
                acc = jnp.log(jax.random.uniform(k2, dtype=theta.dtype)) < log_rate
                return (jnp.where(acc, prop, theta), jnp.where(acc, ptv, tv),
                        jnp.where(acc, pgv, gv)), acc

            tv, gv = jax.value_and_grad(target)(theta)
            (theta, _, _), accs = jax.lax.scan(body, (theta, tv, gv),
                                               jax.random.split(key, self.num_mutation_steps))
            return theta, jnp.mean(accs.astype(theta.dtype))

        def one_mh(key, theta):
            def body(carry, k):
                theta, tv = carry
                k1, k2 = jax.random.split(k)
                prop = theta + jnp.sqrt(step) * jax.random.normal(k1, theta.shape, dtype=theta.dtype)
                ptv = target(prop)
                acc = jnp.log(jax.random.uniform(k2, dtype=theta.dtype)) < (ptv - tv)
                return (jnp.where(acc, prop, theta), jnp.where(acc, ptv, tv)), acc

            (theta, _), accs = jax.lax.scan(body, (theta, target(theta)),
                                            jax.random.split(key, self.num_mutation_steps))
            return theta, jnp.mean(accs.astype(theta.dtype))

        one = one_mala if self.mutation == "MALA" else one_mh
        keys = jax.random.split(key, particles.shape[0])
        return jax.vmap(one)(keys, particles)

    # ---- adaptive next-temperature: ESS bisection ----

    def _next_beta(self, log_w, pots, beta_prev):
        """Largest b in (beta_prev, 1] with ESS of the reweighted cloud at
        least ``adaptive_target_ess * N`` — 30 bisection steps on the
        monotone ESS(b) curve (two logsumexps per step: negligible next to
        one mutation pass)."""
        n = log_w.shape[0]
        dtype = log_w.dtype
        target = jnp.asarray(self.adaptive_target_ess * n, dtype)
        one = jnp.asarray(1.0, dtype)

        def ess_at(b):
            return jnp.exp(log_ess(log_w + (b - beta_prev) * pots))

        full_ok = ess_at(one) >= target

        def body(_, c):
            lo, hi = c
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid))

        lo, _ = jax.lax.fori_loop(0, 30, body, (beta_prev, one))
        # never stall: bisection can collapse onto beta_prev when even tiny
        # increments break the target; force a minimal advance
        lo = jnp.maximum(lo, beta_prev + jnp.asarray(1e-6, dtype))
        return jnp.where(full_ok, one, jnp.minimum(lo, one))

    # ---- the annealing pass ----

    def _stage_core(self, key_res, key_mut, particles, log_w, log_z, pots,
                    beta_prev, beta, x, y, force_resample=None):
        """Reweight -> ESS-triggered systematic resample -> mutate: the body
        shared by the fixed-schedule scan and the adaptive while_loop.

        ``force_resample``: extra resample trigger from the adaptive driver
        — when the ESS bisection's constraint was BINDING (beta < 1 chosen
        to land ESS exactly at the target), the landed ESS sits marginally
        above ``ess_threshold * n`` and the pure threshold test never fires,
        so weights stay degenerate at the target and the next bisection can
        only advance by its forced minimum (observed as stalled duplicate
        betas). Del Moral-style adaptive tempering resamples whenever the
        constraint binds."""
        n = log_w.shape[0]
        # 1. reweight: w *= lik^(beta - beta_prev); accumulate evidence as
        # the log mean incremental weight under the previous normalization
        incr = (beta - beta_prev) * pots
        norm_prev = jax.nn.softmax(log_w)
        log_z = log_z + jax.scipy.special.logsumexp(jnp.log(norm_prev) + incr)
        log_w = log_w + incr

        # 2. resample if ESS below threshold
        ess = jnp.exp(log_ess(log_w))
        do_resample = ess < self.ess_threshold * n
        if force_resample is not None:
            do_resample = do_resample | force_resample
        norm_w = jax.nn.softmax(log_w)
        idx = systematic_resample_indices(key_res, norm_w)
        particles = jnp.where(do_resample, particles[idx], particles)
        log_w = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)
        unique_frac = jnp.where(
            do_resample,
            jnp.bincount(idx, length=n).astype(particles.dtype).clip(0, 1).mean(),
            jnp.ones((), dtype=particles.dtype),
        )

        # 3. mutate with MCMC at the new temperature
        particles, acc = self._mutate(key_mut, particles, beta, x, y)

        out = {"beta": beta, "ess": ess, "resampled": do_resample,
               "mutation_acceptance": jnp.mean(acc), "unique_frac": unique_frac}
        return particles, log_w, log_z, out

    def run(self, key, data, jit=True, record=False, backend="auto"):
        """Anneal prior -> posterior over the beta schedule (fixed scan, or
        ESS-bisection adaptive tempering when constructed with
        ``betas="adaptive"``).

        Returns (final SMCState, diagnostics dict with per-stage ess,
        resampled flags, mutation acceptance, log normalizing-constant
        estimate; adaptive runs add ``num_stages`` and trim the per-stage
        arrays to the stages actually run).

        ``backend="auto"`` (default) routes eligible runs on TPU onto the
        whole-anneal resident driver (ops/resident_smc.py): MALA/MH
        mutation passes VMEM-resident, one device program for the whole
        ladder — architecture models via the chain-lane vg, non-Bayesian
        DistributionModel targets via the generic per-lane traced vg
        (samplers/dispatch.py::resolve_smc documents eligibility). Kernel
        PRNG draws are statistically equivalent, not bit-matched; pass
        "scan" for the generic jax.random path."""
        x, y = (jnp.asarray(data[0]), jnp.asarray(data[1]))
        n = self.num_particles
        if jit and backend != "scan":
            from eeyore_tpu.samplers.dispatch import resolve_smc, run_smc_backend

            cb, _reason = resolve_smc(self, data, backend=backend)
            if cb is not None:
                # pass the ORIGINAL data objects: the schedule identity
                # cache keys on them, keeping the host-fetch cache warm
                return run_smc_backend(self, key, data, cb)
        if self.adaptive:
            return self._run_adaptive(key, x, y, jit=jit, cache_data=data)

        def stage(carry, inputs):
            particles, log_w, log_z, key = carry
            beta_prev, beta = inputs
            key, key_res, key_mut = jax.random.split(key, 3)
            pots = jax.vmap(lambda t: self._potential(t, x, y))(particles)
            particles, log_w, log_z, out = self._stage_core(
                key_res, key_mut, particles, log_w, log_z, pots,
                beta_prev, beta, x, y)
            return (particles, log_w, log_z, key), out

        def run_fn(key):
            key_init, key_stages = jax.random.split(key)
            particles = self._sample_init(key_init)
            log_w = jnp.zeros(n, dtype=particles.dtype)
            log_z = jnp.zeros((), dtype=particles.dtype)
            pairs = jnp.stack([self.betas[:-1], self.betas[1:]], axis=1)
            (particles, log_w, log_z, _), diags = jax.lax.scan(
                stage, (particles, log_w, log_z, key_stages),
                (pairs[:, 0], pairs[:, 1]),
            )
            return particles, log_w, log_z, diags

        fn = self._cached_jit("fixed", data, run_fn) if jit else run_fn
        particles, log_w, log_z, diags = fn(key)
        ess = float(jnp.exp(log_ess(log_w)))
        state = SMCState(
            particles=particles, log_weights=log_w,
            log_lik=jnp.zeros(n, dtype=particles.dtype),
            beta=self.betas[-1], ess=jnp.asarray(ess),
            unique_frac=diags["unique_frac"][-1],
        )
        diagnostics = {k: jax.device_get(v) for k, v in diags.items()}
        diagnostics["log_evidence"] = float(log_z)
        return state, diagnostics

    def _run_adaptive(self, key, x, y, jit=True, cache_data=None):
        """Adaptive tempering: a bounded while_loop whose next temperature
        comes from ``_next_beta``; per-stage diagnostics land in
        ``max_stages``-sized arrays written at the stage index."""
        n = self.num_particles
        M = self.max_stages

        def cond(c):
            return (c["beta"] < 1.0) & (c["stage"] < M)

        def body(c):
            key, key_res, key_mut = jax.random.split(c["key"], 3)
            particles, log_w, log_z = c["particles"], c["log_w"], c["log_z"]
            pots = jax.vmap(lambda t: self._potential(t, x, y))(particles)
            beta = self._next_beta(log_w, pots, c["beta"])
            particles, log_w, log_z, out = self._stage_core(
                key_res, key_mut, particles, log_w, log_z, pots,
                c["beta"], beta, x, y, force_resample=beta < 1.0)
            i = c["stage"]
            diags = {k: c["diags"][k].at[i].set(out[k]) for k in c["diags"]}
            return {"particles": particles, "log_w": log_w, "log_z": log_z,
                    "key": key, "beta": beta, "stage": i + 1, "diags": diags}

        def run_fn(key):
            key_init, key_stages = jax.random.split(key)
            particles = self._sample_init(key_init)
            dtype = particles.dtype
            diags0 = {
                "beta": jnp.zeros(M, dtype), "ess": jnp.zeros(M, dtype),
                "resampled": jnp.zeros(M, bool),
                "mutation_acceptance": jnp.zeros(M, dtype),
                "unique_frac": jnp.zeros(M, dtype),
            }
            out = jax.lax.while_loop(cond, body, {
                "particles": particles,
                "log_w": jnp.zeros(n, dtype),
                "log_z": jnp.zeros((), dtype),
                "key": key_stages,
                "beta": jnp.zeros((), dtype),
                "stage": jnp.zeros((), jnp.int32),
                "diags": diags0,
            })
            return (out["particles"], out["log_w"], out["log_z"],
                    out["stage"], out["beta"], out["diags"])

        fn = (self._cached_jit("adaptive",
                               cache_data if cache_data is not None
                               else (x, y), run_fn)
              if jit else run_fn)
        particles, log_w, log_z, num_stages, final_beta, diags = fn(key)
        num_stages = int(num_stages)
        final_beta = float(final_beta)
        if num_stages >= M and final_beta < 1.0:
            import warnings
            warnings.warn(
                f"adaptive SMC hit max_stages={M} at beta={final_beta:.6f} < 1: "
                "the anneal is TRUNCATED and log_evidence covers only the "
                "completed ladder prefix; raise max_stages or "
                "adaptive_target_ess", RuntimeWarning)
        ess = float(jnp.exp(log_ess(log_w)))
        state = SMCState(
            particles=particles, log_weights=log_w,
            log_lik=jnp.zeros(n, dtype=particles.dtype),
            beta=jnp.asarray(final_beta, particles.dtype), ess=jnp.asarray(ess),
            unique_frac=diags["unique_frac"][num_stages - 1],
        )
        diagnostics = {k: jax.device_get(v)[:num_stages] for k, v in diags.items()}
        diagnostics["num_stages"] = num_stages
        diagnostics["log_evidence"] = float(log_z)
        return state, diagnostics

    @staticmethod
    def estimate(state, f=lambda t: t):
        """Self-normalized importance estimate of E_pi[f] from the final
        particle cloud."""
        w = jax.nn.softmax(state.log_weights)
        vals = jax.vmap(f)(state.particles)
        return jnp.tensordot(w, vals, axes=1)
