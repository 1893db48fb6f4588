"""Experiment harness: the reference's epoch-based ``run`` and multi-chain
``benchmark`` workflows on top of the scan/vmap runners.

Reference semantics (/root/reference/eeyore/samplers/serial_sampler.py:35-126):
- ``run(num_epochs, num_burnin_epochs)``: iterations = epochs x batches,
  burn-in discarded, verbose wall-clock reporting;
- ``benchmark(num_chains, ..., path, init, check_conditions)``: simulate
  chains from prior-sampled (or given) inits until ``num_chains`` SUCCEED,
  filtering by a user ``check_conditions(chain, runtime)`` predicate and
  catching per-chain errors; write each accepted chain to ``run<i>/`` as CSVs
  plus ``runtime.txt``, error texts under ``errors/``, and a final
  ``run_counts.txt`` with succeeded / unmet-conditions / runtime-error
  counts.

The TPU twist: candidate chains are simulated in vmapped BATCHES of
``batch_chains`` at a time instead of one-by-one; the retry loop tops up
until the success quota is met.
"""

import time

from datetime import timedelta
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.chains import ChainList
from eeyore_tpu.datasets import DataCounter, as_schedule
from eeyore_tpu.samplers.runner import sample_chain, sample_chains


class SamplerHarness:
    """Binds a transition kernel + data into the reference's Sampler API."""

    def __init__(self, kernel, data, theta0=None, key=None):
        self.kernel = kernel
        self.schedule = as_schedule(data)
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.theta0 = theta0
        self.chain = ChainList(keys=self.kernel.state_keys)
        self.counter = DataCounter(
            batch_size=self.schedule.x.shape[1],
            sample_size=self.schedule.x.shape[0] * self.schedule.x.shape[1],
            num_batches=self.schedule.num_batches,
        )
        self.final_state = None

    def get_model(self):
        return self.kernel.model

    def get_chain(self):
        return self.chain

    def get_sample(self, idx):
        return self.chain.get_sample(idx)

    def get_param(self, idx):
        return self.chain.get_param(idx)

    def reset(self, theta, key=None, reset_chain=True):
        self.theta0 = jnp.asarray(theta)
        if key is not None:
            self.key = key
        if reset_chain:
            self.chain = ChainList(keys=self.kernel.state_keys)

    def run(self, num_epochs, num_burnin_epochs, verbose=False, verbose_step=100,
            record_thin=1, backend="auto", record_keys=None):
        """One jitted two-phase scan; epochs x batches iteration accounting.

        With no ``theta0`` given, the initial state is drawn from the model's
        prior (the reference's ``benchmark`` init semantics,
        serial_sampler.py:80). ``record_thin`` keeps every thin-th
        post-burn-in state.

        ``backend="auto"`` routes eligible configs on TPU onto the
        whole-loop Pallas kernels (samplers/dispatch.py; kernel-backed
        chains record sample + derived accepted by default — pass
        ``record_keys=("sample", "accepted", "target_val")`` for in-kernel
        exact extras, or keys beyond those for the scanned fallback; draws
        statistically equivalent but not bit-matched); "scan" forces the
        reference-shaped scanned path. ``verbose=True`` implies the scanned
        path (in-flight segment reporting needs host round-trips the
        kernels never make).

        ``verbose=True`` reports in-flight progress every ``verbose_step``
        iterations (the reference's per-draw wall-clock cadence,
        serial_sampler.py:43-50): the scan is executed in jitted SEGMENTS of
        ``verbose_step`` iterations sharing one compiled program per segment
        shape, with the same per-iteration key fold-in as the silent path —
        the produced chain is identical."""
        if self.theta0 is None:
            self.key, key_init = jax.random.split(self.key)
            self.theta0 = self.get_model().prior.sample(key_init)
        self.counter.set_epoch_info(num_epochs, num_burnin_epochs)
        start = time.perf_counter()
        if verbose:
            chain, state = self._run_segmented(verbose_step, record_thin)
        else:
            chain, state = sample_chain(
                self.kernel, self.key, self.theta0, self.schedule,
                self.counter.num_iters, self.counter.num_burnin_iters,
                return_state=True, record_thin=record_thin, backend=backend,
                record_keys=record_keys,
            )
        runtime = time.perf_counter() - start
        if verbose:
            print(f"{self.counter.num_iters} iterations "
                  f"({self.counter.num_epochs} epochs, {self.counter.num_burnin_epochs} burn-in) "
                  f"in {timedelta(seconds=runtime)}")
        self.chain = chain
        self.final_state = state
        self.last_runtime = runtime
        return chain

    def _run_segmented(self, verbose_step, record_thin):
        """Verbose runner: same math as ``sample_chain`` (identical key
        discipline — fold_in on the GLOBAL iteration index), executed in
        verbose_step-sized jitted segments with per-segment wall-clock
        prints, mirroring reference serial_sampler.py:41-50."""
        from eeyore_tpu.samplers.runner import _check_thin, _phase_scan

        kernel, schedule = self.kernel, self.schedule
        num_iters = self.counter.num_iters
        num_burnin = self.counter.num_burnin_iters
        _check_thin(num_iters, num_burnin, record_thin)
        if getattr(kernel, "auto_depth", False):
            kernel.resolve_auto_budget(schedule, key=self.key)
        kernel.recompute_current = schedule.num_batches != 1
        if hasattr(kernel, "num_burnin_iters"):
            kernel.num_burnin_iters = num_burnin
        record_keys = tuple(kernel.state_keys)

        init_key, chain_key = jax.random.split(self.key)
        kernel.init_schedule = schedule
        xb, yb = schedule.batch(0)
        state = kernel.init(jnp.asarray(self.theta0), xb, yb, key=init_key)

        seg_cache = {}

        def run_segment(state, start, length, record):
            sig = (length, record)
            if sig not in seg_cache:
                def f(key, st, start_idx):
                    return _phase_scan(
                        kernel, key, st, schedule, start_idx, length,
                        record_keys if record else None,
                        thin=record_thin if record else 1)
                seg_cache[sig] = jax.jit(f)
            return seg_cache[sig](chain_key, state, jnp.asarray(start))

        def report(done, seg_len, dt):
            epoch = (done - 1) // self.counter.num_batches + 1
            print(f"Iteration {done}/{num_iters}, epoch {epoch}/"
                  f"{self.counter.num_epochs}: last {seg_len} iterations "
                  f"in {timedelta(seconds=dt)}")

        # burn-in phase in plain segments
        pos = 0
        while pos < num_burnin:
            seg = min(verbose_step, num_burnin - pos)
            t0 = time.perf_counter()
            state, _ = run_segment(state, pos, seg, record=False)
            jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
            report(pos + seg, seg, time.perf_counter() - t0)
            pos += seg

        # sampling phase: segment lengths stay multiples of record_thin so
        # thin blocks never straddle a segment boundary
        seg_unit = max(record_thin, verbose_step - verbose_step % record_thin)
        recorded = []
        while pos < num_iters:
            seg = min(seg_unit, num_iters - pos)
            t0 = time.perf_counter()
            state, rec = run_segment(state, pos, seg, record=True)
            jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
            report(pos + seg, seg, time.perf_counter() - t0)
            recorded.append(rec)
            pos += seg

        stacked = {k: np.concatenate([np.asarray(r[k]) for r in recorded])
                   for k in record_keys}
        return ChainList.from_arrays(stacked), state

    def to_chainfile(self, path=None, mode="a"):
        self.chain.to_chainfile(path=path, mode=mode)

    # ------------------------------------------------------------------

    def benchmark(self, num_chains, num_epochs, num_burnin_epochs, path,
                  init=None, check_conditions=None, verbose=False,
                  batch_chains=None, max_attempts=None, backend="auto"):
        """Simulate until ``num_chains`` chains pass ``check_conditions``.

        Returns the list of accepted ChainLists. Filesystem layout matches
        the reference: run<i>/{sample.csv,...,runtime.txt}, errors/,
        run_counts.txt.

        Retry semantics mirror the reference (serial_sampler.py:72: a bare
        ``while`` until the quota is met): ``max_attempts=None`` retries
        forever; pass an int to cap batches (e.g. in tests). An explicit
        ``init`` list is consumed the way the reference indexes ``init[i]``
        by success count: each batch starts at the current success index, so
        failed inits are retried and later entries are reached once earlier
        chains succeed; entries past the end fall back to prior draws.

        RUNTIME SEMANTICS (documented divergence from the reference): the
        reference simulates chains one at a time, so its
        ``check_conditions(chain, runtime)`` sees each chain's own
        wall-clock (serial_sampler.py:83-94). Here chains run in vmapped
        batches; the ``runtime`` passed to ``check_conditions`` (and written
        to ``runtime.txt``) is the BATCH wall-clock divided by
        ``batch_chains`` — the amortized per-chain cost, which is the
        honest per-chain number on a SIMD device (chains share every
        instruction; no per-chain wall exists). Predicates ported from the
        reference that threshold on runtime should expect values ~batch_chains
        times smaller. Pinned by tests/test_harness.py.
        """
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        self.counter.set_epoch_info(num_epochs, num_burnin_epochs)
        batch_chains = batch_chains or num_chains

        succeeded, failed_conditions, failed_errors = 0, 0, 0
        accepted = []
        key = self.key
        attempts = 0

        while succeeded < num_chains and (max_attempts is None
                                          or attempts < max_attempts):
            attempts += 1
            key, key_init, key_run = jax.random.split(key, 3)

            init_keys = jax.random.split(key_init, batch_chains)
            if init is not None:
                theta0s = jnp.stack([
                    jnp.asarray(init[succeeded + c]) if succeeded + c < len(init)
                    else self.get_model().prior.sample(init_keys[c])
                    for c in range(batch_chains)])
            else:
                theta0s = jnp.stack([self.get_model().prior.sample(k) for k in init_keys])

            start = time.perf_counter()
            try:
                chains = sample_chains(
                    self.kernel, key_run, theta0s, self.schedule,
                    self.counter.num_iters, self.counter.num_burnin_iters,
                    backend=backend,
                )
            except (RuntimeError, FloatingPointError) as err:
                failed_errors += batch_chains
                err_path = path / "errors"
                err_path.mkdir(parents=True, exist_ok=True)
                with open(err_path / f"error{failed_errors}.txt", "w") as f:
                    f.write(f"{err}\n")
                continue
            runtime = (time.perf_counter() - start) / batch_chains

            for c in range(chains.num_chains()):
                if succeeded >= num_chains:
                    break
                chain = ChainList.from_arrays({k: chains.get_chain(c, key=k)
                                               for k in chains.keys()})
                # per-chain sanity: NaNs count as runtime failures
                if not np.all(np.isfinite(chain.get_samples())):
                    failed_errors += 1
                    err_path = path / "errors"
                    err_path.mkdir(parents=True, exist_ok=True)
                    with open(err_path / f"error{failed_errors}.txt", "w") as f:
                        f.write("non-finite samples in chain\n")
                    continue
                if (check_conditions is None) or check_conditions(chain, runtime):
                    succeeded += 1
                    run_path = path / ("run" + str(succeeded).zfill(len(str(num_chains))))
                    run_path.mkdir(parents=True, exist_ok=True)
                    chain.to_chainfile(path=run_path, mode="w")
                    with open(run_path / "runtime.txt", "w") as f:
                        f.write(f"{runtime}\n")
                    accepted.append(chain)
                    if verbose:
                        print(f"chain {succeeded}/{num_chains} accepted "
                              f"(acceptance {chain.acceptance_rate():.3f}, "
                              f"runtime {timedelta(seconds=runtime)})")
                else:
                    failed_conditions += 1
                    if verbose:
                        print("chain failed conditions")

        with open(path / "run_counts.txt", "w") as f:
            f.write(f"{succeeded},succesful\n")
            f.write(f"{failed_conditions},unmet_conditions\n")
            f.write(f"{failed_errors},runtime_errors\n")

        return accepted
