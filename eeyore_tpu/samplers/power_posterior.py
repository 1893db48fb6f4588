"""Power-posterior / parallel-tempering population MCMC.

Reference semantics: /root/reference/eeyore/samplers/power_posterior_sampler.py:15-183:
- a ladder of num_chains tempered targets, default temperatures ((i/N)^4 for
  i=1..N) (:91-92), the coldest (temperature 1) chain last;
- per-iteration within-chain moves by a per-chain MH or MALA kernel;
- every ``between_step`` iterations, between-chain swap moves: chain i picks
  partner j from a truncated-geometric categorical P(j|i) ~ exp(-b |j-i|)
  (:107-122), and the swap is accepted with log-rate = categorical correction
  + cross-temperature targets (:135-141).

TPU design: the ladder is ONE vmapped kernel state with a temperature axis —
no per-chain model deep copies; the temperature enters the target as a traced
scalar. Swap sweeps come in two flavours:
- 'categorical': the reference's serial sweep (a ``fori_loop`` with dynamic
  row gather/scatter) — sequential by construction, single-device;
- 'even_odd': stochastic even/odd adjacent-pair swaps, fully vectorized —
  the scheme that maps onto ``ppermute`` when the temperature axis is
  sharded across devices (see eeyore_tpu.parallel).
"""

import math

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.samplers.mala import MALA
from eeyore_tpu.samplers.mh import MetropolisHastings
from eeyore_tpu.samplers.population import PopulationKernel, sample_population


def default_temperatures(num_chains):
    """((i/N)^4 for i=1..N) — reference power_posterior_sampler.py:91-92."""
    return np.array([(i / num_chains) ** 4 for i in range(1, num_chains + 1)])


def categorical_swap_probs(num_chains, b=0.5):
    """P[i, j] = P(partner j | chain i) ~ exp(-b |j - i|), j != i, rows
    normalized by the truncated-geometric sum (reference :107-122)."""
    eb = math.exp(-b)
    P = np.zeros((num_chains, num_chains))
    for i in range(num_chains):
        denom = eb * (2 - eb**i - eb ** (num_chains - 1 - i)) / (1 - eb)
        for j in range(num_chains):
            if j != i:
                P[i, j] = eb ** abs(j - i) / denom
    return P


class PPState(NamedTuple):
    inner: Any  # stacked sub-kernel state, leaves [num_chains, ...]


class PowerPosteriorSampler(PopulationKernel):
    state_keys = ("sample", "target_val", "accepted")

    def __init__(self, model, num_chains, sampler="MALA", sampler_kwargs=None,
                 temperature=None, between_step=10, b=0.5, swap_scheme="categorical",
                 recompute_current=False):
        super().__init__(model, recompute_current=recompute_current)
        if getattr(model, "temperature", None) is not None:
            raise ValueError("pass an untempered model; the ladder applies temperatures")
        self.num_chains = num_chains
        self.sampler = sampler
        self.sampler_kwargs = sampler_kwargs or {}
        self.between_step = between_step
        self.b = b
        self.swap_scheme = swap_scheme

        if temperature is None:
            temperature = default_temperatures(num_chains)
        elif len(temperature) != num_chains:
            raise ValueError("len(temperature) != num_chains")
        self.temperatures = jnp.asarray(np.asarray(temperature, dtype=np.float64))
        self._swap_probs = jnp.asarray(categorical_swap_probs(num_chains, b))
        self._has_grad = sampler == "MALA"

    def default_indicator(self):
        """Accessors address the coldest (last) chain by default
        (reference :84-85)."""
        return self.num_chains - 1

    def _make_kernel(self, temp):
        model_t = self.model.with_temperature(temp)
        if self.sampler == "MALA":
            return MALA(model_t, recompute_current=self.recompute_current, **self.sampler_kwargs)
        elif self.sampler == "MetropolisHastings":
            return MetropolisHastings(model_t, recompute_current=self.recompute_current,
                                      **self.sampler_kwargs)
        raise ValueError(f"unsupported ladder sampler {self.sampler!r} "
                         "(reference supports MetropolisHastings and MALA)")

    def _base_val_grad(self, theta, x, y):
        if self._has_grad:
            return jax.value_and_grad(self.model.log_target)(theta, x, y)
        return self.model.log_target(theta, x, y), None

    # ------------------------------------------------------------------

    def init(self, thetas, x, y, key=None):
        thetas = jnp.asarray(thetas)
        if thetas.ndim == 1:  # reference: same theta0 for every chain
            thetas = jnp.broadcast_to(thetas, (self.num_chains,) + thetas.shape)
        temps = self.temperatures.astype(thetas.dtype)

        def init_one(theta, temp):
            return self._make_kernel(temp).init(theta, x, y)

        inner = jax.vmap(init_one)(thetas, temps)
        return PPState(inner=inner)

    def _within_moves(self, key, inner, x, y, iteration):
        temps = self.temperatures
        keys = jax.random.split(key, self.num_chains)

        def move(k, sub, temp):
            kern = self._make_kernel(temp)
            new_sub, _ = kern.step(k, sub, x, y, iteration)
            return new_sub

        return jax.vmap(move)(keys, inner, temps.astype(inner.sample.dtype))

    # ---- swap moves ----

    def _apply_swap(self, inner, i, j, accept, x, y):
        """Swap samples of chains i and j (traced indices) if accept, updating
        their tempered targets (and grads) at the swapped positions."""
        temps = self.temperatures.astype(inner.sample.dtype)
        theta_i = inner.sample[i]
        theta_j = inner.sample[j]
        val_j, grad_j = self._base_val_grad(theta_j, x, y)  # -> new state of chain i
        val_i, grad_i = self._base_val_grad(theta_i, x, y)  # -> new state of chain j

        def upd(leaf, vi, vj):
            return leaf.at[i].set(jnp.where(accept, vi, leaf[i])).at[j].set(
                jnp.where(accept, vj, leaf[j]))

        sample = upd(inner.sample, theta_j, theta_i)
        target = upd(inner.target_val, temps[i] * val_j, temps[j] * val_i)
        replacements = {"sample": sample, "target_val": target}
        if self._has_grad:
            replacements["grad_val"] = upd(inner.grad_val, temps[i] * grad_j, temps[j] * grad_i)
        return inner._replace(**replacements)

    def _between_moves_categorical(self, key, inner, x, y):
        """Serial sweep i = 0..N-1 with categorical partner choice — the
        reference's between_chain_moves (:165-169)."""
        P = self._swap_probs
        logP = jnp.log(jnp.where(P > 0, P, 1.0))
        temps = self.temperatures.astype(inner.sample.dtype)

        def body(i, carry):
            inner, key = carry
            key, key_j, key_acc = jax.random.split(key, 3)
            j = jax.random.choice(key_j, self.num_chains, p=P[i])

            base_i = self.model.log_target(inner.sample[i], x, y)
            base_j = self.model.log_target(inner.sample[j], x, y)
            # log-rate (reference :135-141): P(i|j) - P(j|i) - pi_i(th_i)
            # - pi_j(th_j) + pi_i(th_j) + pi_j(th_i)
            log_rate = (
                logP[j, i] - logP[i, j]
                - inner.target_val[i] - inner.target_val[j]
                + temps[i] * base_j + temps[j] * base_i
            )
            u = jax.random.uniform(key_acc, dtype=inner.sample.dtype)
            accept = jnp.log(u) < log_rate
            inner = self._apply_swap(inner, i, j, accept, x, y)
            return (inner, key)

        inner, _ = jax.lax.fori_loop(0, self.num_chains, body, (inner, key))
        return inner

    def _between_moves_even_odd(self, key, inner, x, y, iteration):
        """Vectorized adjacent-pair swaps; parity alternates per swap round."""
        N = self.num_chains
        temps = self.temperatures.astype(inner.sample.dtype)
        parity = (iteration // self.between_step) % 2
        idx = jnp.arange(N)
        is_lower = (idx % 2) == (parity % 2)
        partner = jnp.where(is_lower, idx + 1, idx - 1)
        valid = (partner >= 0) & (partner < N)
        partner = jnp.clip(partner, 0, N - 1)

        base = jax.vmap(lambda t: self.model.log_target(t, x, y))(inner.sample)
        # pairwise log-rate evaluated identically on both elements of a pair
        log_rate = (
            -inner.target_val - inner.target_val[partner]
            + temps * base[partner] + temps[partner] * base
        )
        pair_key_id = jnp.minimum(idx, partner)
        u = jax.vmap(lambda pid: jax.random.uniform(jax.random.fold_in(key, pid),
                                                    dtype=inner.sample.dtype))(pair_key_id)
        accept = valid & (jnp.log(u) < log_rate)

        new_sample = jnp.where(accept[:, None], inner.sample[partner], inner.sample)
        new_target = jnp.where(accept, temps * base[partner], inner.target_val)
        replacements = {"sample": new_sample, "target_val": new_target}
        if self._has_grad:
            grads = jax.vmap(lambda t: jax.grad(self.model.log_target)(t, x, y))(inner.sample)
            new_grad = jnp.where(accept[:, None], temps[:, None] * grads[partner], inner.grad_val)
            replacements["grad_val"] = new_grad
        return inner._replace(**replacements)

    # ------------------------------------------------------------------

    def step(self, key, state, x, y, iteration):
        key_within, key_between = jax.random.split(key)
        inner = self._within_moves(key_within, state.inner, x, y, iteration)

        do_swap = (iteration % self.between_step) == 0
        if self.swap_scheme == "categorical":
            inner = jax.lax.cond(
                do_swap,
                lambda inn: self._between_moves_categorical(key_between, inn, x, y),
                lambda inn: inn,
                inner,
            )
        else:
            inner = jax.lax.cond(
                do_swap,
                lambda inn: self._between_moves_even_odd(key_between, inn, x, y, iteration),
                lambda inn: inn,
                inner,
            )

        new_state = PPState(inner=inner)
        info = {k: getattr(inner, k) for k in self.state_keys}
        return new_state, info

    def run(self, key, theta0, data, num_iters, num_burnin_iters=0,
            record_keys=None, jit=True, backend="auto", all_ladders=False):
        """Run the ladder; returns ChainLists with one chain per rung (the
        coldest chain last, as in the reference).

        ``backend="auto"`` (default) routes eligible even/odd-swap ladders
        on TPU onto the whole-ladder resident kernels
        (ops/resident_tempering{_dense}.py — samplers/dispatch.py
        resolve_tempering documents eligibility and the recorded-key
        contract); categorical-swap ladders and everything off-TPU run the
        scanned path, forced with "scan".

        ``all_ladders=True``: on a kernel backend, return EVERY independent
        ladder the chain_block already computed (chain_block/num_chains of
        them, ladder-major — see dispatch.run_tempering_backend) instead of
        just ladder 0; cross-ladder convergence diagnostics then need no
        extra runs. The scanned path runs a single ladder, so there it is
        a no-op."""
        if jit and backend != "scan":
            from eeyore_tpu.samplers.dispatch import (
                resolve_tempering, run_tempering_backend,
            )

            plan, _reason = resolve_tempering(
                self, data, num_iters, num_burnin_iters, backend=backend,
                record_keys=record_keys)
            if plan is not None:
                return run_tempering_backend(
                    self, key, theta0, data, num_iters, num_burnin_iters,
                    plan, all_ladders=all_ladders)
        return sample_population(self, key, theta0, data, num_iters, num_burnin_iters,
                                 record_keys=record_keys, jit=jit)
