"""Harness tests: epoch-based run + the benchmark retry/condition workflow
with its filesystem layout (reference serial_sampler.py:54-126 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import DistributionModel, MLP, loss_functions, mlp
from eeyore_tpu.samplers import MALA, MetropolisHastings, SamplerHarness

EMPTY = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))


def bvn_model():
    prec = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.5], [0.5, 1.0]])))
    return DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)


def xor_mlp():
    x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
    return model, (x, y)


class TestRun:
    def test_epoch_accounting(self):
        h = SamplerHarness(MALA(bvn_model(), step=0.4), EMPTY,
                           theta0=jnp.asarray([1.0, 1.0]), key=jax.random.PRNGKey(0))
        chain = h.run(num_epochs=1000, num_burnin_epochs=200)
        assert len(chain) == 800  # (1000 - 200) epochs x 1 batch
        assert 0.3 < chain.acceptance_rate() < 1.0
        assert h.counter.num_iters == 1000

    def test_default_theta0_samples_prior(self):
        # no theta0: run() must fall back to a prior draw (reference
        # serial_sampler.py:80 init semantics), not crash on jnp.asarray(None)
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=0.01), data)
        chain = h.run(num_epochs=50, num_burnin_epochs=10)
        assert len(chain) == 40
        assert h.theta0.shape == (model.num_params,)

    def test_reset(self):
        h = SamplerHarness(MetropolisHastings(bvn_model(), scale=0.5), EMPTY,
                           theta0=jnp.zeros(2))
        h.run(100, 10)
        h.reset(jnp.asarray([5.0, 5.0]))
        assert len(h.chain) == 0
        chain = h.run(100, 10)
        assert len(chain) == 90


class TestBenchmark:
    def test_quota_and_layout(self, tmp_path):
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=0.05), data, key=jax.random.PRNGKey(1))
        accepted = h.benchmark(num_chains=3, num_epochs=200, num_burnin_epochs=50,
                               path=tmp_path, batch_chains=3)
        assert len(accepted) == 3
        for i in (1, 2, 3):
            run_dir = tmp_path / f"run{i}"
            assert (run_dir / "sample.csv").exists()
            assert (run_dir / "runtime.txt").exists()
        counts = (tmp_path / "run_counts.txt").read_text().splitlines()
        assert counts[0] == "3,succesful"

    def test_conditions_filter(self, tmp_path):
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=0.05), data, key=jax.random.PRNGKey(2))
        # impossible condition -> quota never met, counts recorded
        accepted = h.benchmark(num_chains=2, num_epochs=50, num_burnin_epochs=10,
                               path=tmp_path, batch_chains=2, max_attempts=2,
                               check_conditions=lambda chain, rt: chain.acceptance_rate() > 2)
        assert accepted == []
        counts = (tmp_path / "run_counts.txt").read_text().splitlines()
        assert counts[0] == "0,succesful"
        assert counts[1] == "4,unmet_conditions"

    def test_runtime_is_batch_amortized_per_chain(self, tmp_path):
        """Pins the documented divergence from the reference: the runtime
        passed to check_conditions (and written to runtime.txt) is the BATCH
        wall-clock divided by batch_chains — identical for every chain of a
        batch — not a per-chain wall (reference serial_sampler.py:83-94
        times chains one at a time; no per-chain wall exists under vmap)."""
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=0.05), data, key=jax.random.PRNGKey(5))
        seen = []

        def conds(chain, runtime):
            seen.append(runtime)
            return True

        h.benchmark(num_chains=4, num_epochs=50, num_burnin_epochs=10,
                    path=tmp_path, batch_chains=4, check_conditions=conds)
        assert len(seen) == 4
        assert all(rt == seen[0] for rt in seen)  # one amortized number per batch
        written = float((tmp_path / "run1" / "runtime.txt").read_text())
        assert written == seen[0]

    def test_given_inits(self, tmp_path):
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=0.05), data, key=jax.random.PRNGKey(3))
        init = [jnp.zeros(model.num_params), jnp.ones(model.num_params) * 0.1]
        accepted = h.benchmark(num_chains=2, num_epochs=50, num_burnin_epochs=10,
                               path=tmp_path, init=init, batch_chains=2)
        assert len(accepted) == 2


class TestVerboseRun:
    def test_verbose_segments_match_silent_run(self, capsys):
        """The segmented verbose runner shares the silent path's key
        discipline (fold_in on the global iteration index) — the produced
        chain must be IDENTICAL, with in-flight progress printed every
        verbose_step iterations (reference serial_sampler.py:43-50)."""
        h1 = SamplerHarness(MALA(bvn_model(), step=0.4), EMPTY,
                            theta0=jnp.asarray([1.0, 1.0]), key=jax.random.PRNGKey(5))
        silent = h1.run(num_epochs=300, num_burnin_epochs=100)
        h2 = SamplerHarness(MALA(bvn_model(), step=0.4), EMPTY,
                            theta0=jnp.asarray([1.0, 1.0]), key=jax.random.PRNGKey(5))
        loud = h2.run(num_epochs=300, num_burnin_epochs=100, verbose=True,
                      verbose_step=64)
        np.testing.assert_array_equal(np.asarray(loud.get_samples()),
                                      np.asarray(silent.get_samples()))
        out = capsys.readouterr().out
        # ceil(100/64) burn-in + ceil(200/64) sampling segment reports
        assert out.count("Iteration ") == 2 + 4
        assert "Iteration 300/300" in out

    def test_verbose_with_thinning(self):
        h = SamplerHarness(MALA(bvn_model(), step=0.4), EMPTY,
                           theta0=jnp.asarray([0.5, -0.5]), key=jax.random.PRNGKey(6))
        loud = h.run(num_epochs=260, num_burnin_epochs=100, verbose=True,
                     verbose_step=50, record_thin=4)
        assert len(loud) == 40  # 160 post-burn-in / 4
        h2 = SamplerHarness(MALA(bvn_model(), step=0.4), EMPTY,
                            theta0=jnp.asarray([0.5, -0.5]), key=jax.random.PRNGKey(6))
        silent = h2.run(num_epochs=260, num_burnin_epochs=100, record_thin=4)
        np.testing.assert_array_equal(np.asarray(loud.get_samples()),
                                      np.asarray(silent.get_samples()))


class TestBenchmarkRetrySemantics:
    def test_retries_until_quota_default_unbounded(self, tmp_path):
        """Reference serial_sampler.py:72 retries with no attempt cap: a
        condition that rejects the first two batches must still end with the
        quota met (the old max_attempts=10 default capped this)."""
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=0.05), data, key=jax.random.PRNGKey(7))
        seen = {"n": 0}

        def flaky(chain, runtime):
            seen["n"] += 1
            return seen["n"] > 2

        accepted = h.benchmark(num_chains=2, num_epochs=50, num_burnin_epochs=10,
                               path=tmp_path, batch_chains=1, check_conditions=flaky)
        assert len(accepted) == 2
        counts = (tmp_path / "run_counts.txt").read_text().splitlines()
        assert counts[0] == "2,succesful"
        assert counts[1] == "2,unmet_conditions"

    def test_init_list_consumed_past_first_batch(self, tmp_path):
        """Inits are indexed by success count (reference init[i]): with
        batch_chains=1 and num_chains=3, all three provided inits must be
        used — the old code re-sliced init[:batch_chains] every attempt."""
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=1e-8), data, key=jax.random.PRNGKey(8))
        init = [jnp.full((model.num_params,), v) for v in (0.0, 0.3, -0.3)]
        accepted = h.benchmark(num_chains=3, num_epochs=20, num_burnin_epochs=0,
                               path=tmp_path, init=init, batch_chains=1)
        assert len(accepted) == 3
        # with a ~zero step the chains stay at their inits: first recorded
        # samples must match the three DISTINCT inits in order
        firsts = [np.asarray(c.get_samples())[0] for c in accepted]
        for got, want in zip(firsts, init):
            np.testing.assert_allclose(got, np.asarray(want), atol=2e-3)


class TestInitStepBatchCycling:
    def test_minibatch_schedule_cycles(self):
        """find_initial_step with a minibatch schedule must trace the batch
        cycling path (reference hmc.py:62-72) and return a finite positive
        step; with a single-batch schedule it must equal the plain path."""
        from eeyore_tpu.datasets import BatchSchedule
        from eeyore_tpu.samplers import HMC
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        model, (x, y) = xor_mlp()
        kernel = HMC(model, step=0.1, num_steps=4, tuner=HMCDATuner(l=0.4))
        key = jax.random.PRNGKey(9)
        theta = 0.1 * jnp.ones(model.num_params)

        full = BatchSchedule.full_batch(x, y)
        s_plain = kernel.find_initial_step(key, theta, x, y)
        s_full = kernel.find_initial_step(key, theta, x, y, schedule=full)
        np.testing.assert_allclose(np.asarray(s_full), np.asarray(s_plain))

        mini = BatchSchedule(jnp.reshape(x, (2, 2, 2)), jnp.reshape(y, (2, 2, 1)))
        s_mini = kernel.find_initial_step(key, theta, x, y, schedule=mini)
        assert np.isfinite(np.asarray(s_mini)) and np.asarray(s_mini) > 0

    def test_harness_run_wires_schedule(self):
        from eeyore_tpu.samplers import HMC
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        model, (x, y) = xor_mlp()
        h = SamplerHarness(HMC(model, step=0.1, num_steps=4,
                               tuner=HMCDATuner(l=0.4)),
                           data=(x, y), theta0=0.1 * jnp.ones(model.num_params),
                           key=jax.random.PRNGKey(10))
        chain = h.run(num_epochs=40, num_burnin_epochs=20)
        assert len(chain) == 20
        assert getattr(h.kernel, "init_schedule", None) is not None
