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

    def test_given_inits(self, tmp_path):
        model, data = xor_mlp()
        h = SamplerHarness(MALA(model, step=0.05), data, key=jax.random.PRNGKey(3))
        init = [jnp.zeros(model.num_params), jnp.ones(model.num_params) * 0.1]
        accepted = h.benchmark(num_chains=2, num_epochs=50, num_burnin_epochs=10,
                               path=tmp_path, init=init, batch_chains=2)
        assert len(accepted) == 2
