"""Statistical acceptance tests for the sampler zoo.

What the reference leaves to examples/ (sampling closed-form targets and
checking acceptance rate, MC mean, MC-SE, ESS against the truth — cf.
examples/samplers/distributions/bivariate_normal/metropolis_hastings.py:62-133)
is a test here: every kernel must recover a correlated bivariate normal's
moments within Monte-Carlo error, and the tuners must hit their target
acceptance rates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eeyore_tpu.models import DistributionModel, MLP, loss_functions, mlp
from eeyore_tpu.models.model import BayesianModel
from eeyore_tpu.samplers import (
    AM,
    DEMC,
    Gibbs,
    HMC,
    MALA,
    MetropolisHastings,
    PowerPosteriorSampler,
    RAM,
    SMCSampler,
    sample_chain,
    sample_chains,
    sample_population,
)
from eeyore_tpu.tuners.dual_averaging import HMCDATuner

COV = np.array([[1.0, 0.5], [0.5, 1.0]])
PREC = jnp.asarray(np.linalg.inv(COV))
EMPTY = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))


def bvn_model():
    return DistributionModel(lambda t, x, y: -0.5 * t @ PREC @ t, num_params=2)


def xor_data():
    x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
    return x, y


def check_moments(samples, mean_tol=0.12, cov_tol=0.2):
    mean = samples.mean(axis=0)
    cov = np.cov(samples, rowvar=False)
    np.testing.assert_allclose(mean, np.zeros(2), atol=mean_tol)
    np.testing.assert_allclose(cov, COV, atol=cov_tol)


KEY = jax.random.PRNGKey(42)
THETA0 = jnp.asarray([2.0, -2.0])


class TestSingleChainKernels:
    @pytest.mark.parametrize("make", [
        lambda m: MetropolisHastings(m, scale=0.8),
        lambda m: MetropolisHastings(m, scale=0.8, symmetric=False),
        lambda m: MALA(m, step=0.4),
        lambda m: HMC(m, step=0.3, num_steps=8),
        lambda m: AM(m),
        lambda m: RAM(m),
    ], ids=["mh", "mh-asym", "mala", "hmc", "am", "ram"])
    def test_recovers_bvn(self, make):
        chain = sample_chain(make(bvn_model()), KEY, THETA0, EMPTY, 12000, 2000)
        check_moments(chain.get_samples())
        assert 0.05 < chain.acceptance_rate() <= 1.0

    def test_hmc_da_tuner_hits_target_acceptance(self):
        kern = HMC(bvn_model(), tuner=HMCDATuner(l=1.5))
        chain = sample_chain(kern, KEY, THETA0, EMPTY, 12000, 2000)
        assert abs(chain.acceptance_rate() - 0.65) < 0.08
        check_moments(chain.get_samples())

    def test_hmc_da_with_eub(self):
        kern = HMC(bvn_model(), tuner=HMCDATuner(l=1.5, eub=0.5))
        chain, state = sample_chain(kern, KEY, THETA0, EMPTY, 4000, 1000, return_state=True)
        assert float(state.step) <= 0.5 + 1e-12

    def test_ram_targets_default_acceptance(self):
        chain = sample_chain(RAM(bvn_model()), KEY, THETA0, EMPTY, 12000, 2000)
        assert abs(chain.acceptance_rate() - 0.234) < 0.06

    def test_reproducible(self):
        kern = MALA(bvn_model(), step=0.4)
        c1 = sample_chain(kern, KEY, THETA0, EMPTY, 500, 100)
        c2 = sample_chain(kern, KEY, THETA0, EMPTY, 500, 100)
        np.testing.assert_array_equal(c1.get_samples(), c2.get_samples())

    def test_recorded_keys(self):
        chain = sample_chain(HMC(bvn_model(), step=0.3, num_steps=5), KEY, THETA0, EMPTY, 200, 50)
        assert set(chain.vals.keys()) == {"sample", "target_val", "grad_val",
                                          "momentum", "hamiltonian", "accepted"}
        assert chain.get_samples().shape == (150, 2)


class TestVmappedChains:
    def test_many_chains_and_rhat(self):
        kern = MALA(bvn_model(), step=0.4)
        theta0s = jax.random.normal(jax.random.PRNGKey(3), (8, 2)) * 2
        chains = sample_chains(kern, KEY, theta0s, EMPTY, 4000, 1000)
        assert chains.num_chains() == 8
        pooled = chains.get_samples().reshape(-1, 2)
        check_moments(pooled, mean_tol=0.08, cov_tol=0.15)
        rhat, *_ = chains.multi_rhat(method="iid")
        assert abs(rhat - 1.0) < 0.1

    def test_chains_differ(self):
        kern = MetropolisHastings(bvn_model(), scale=0.8)
        theta0s = jnp.zeros((4, 2))
        chains = sample_chains(kern, KEY, theta0s, EMPTY, 300, 0)
        s = chains.get_samples()
        assert not np.allclose(s[0], s[1])


class TestMonitor:
    def test_summarize_run(self):
        from eeyore_tpu.samplers import summarize_run

        kern = HMC(bvn_model(), tuner=HMCDATuner(l=1.0, e0=0.2))
        theta0s = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
        arrays, state = sample_chains(kern, KEY, theta0s, EMPTY, 600, 300,
                                      return_arrays=True, return_state=True)
        summary = summarize_run(arrays, state)
        assert 0.2 < summary["acceptance_mean"] <= 1.0
        assert summary["num_stuck_chains"] == 0
        assert summary["num_diverged_chains"] == 0
        assert summary["tuned_step"]["mean"] > 0
        assert summary["tuned_num_steps"]["max"] >= 1

    def test_record_thin_matches_sliced_full_run(self):
        """Thinning records the last state of each thin-block, so a thinned
        run must equal the full run sliced [thin-1::thin] (per-iteration RNG
        keys make the state trajectory independent of recording)."""
        kern = MALA(bvn_model(), step=0.4)
        theta0 = jnp.asarray([0.5, -0.5])
        full = sample_chain(kern, KEY, theta0, EMPTY, 120, 40)
        thinned = sample_chain(kern, KEY, theta0, EMPTY, 120, 40, record_thin=4)
        assert len(thinned) == 20
        np.testing.assert_array_equal(thinned.get_samples(),
                                      full.get_samples()[3::4])

        import pytest

        with pytest.raises(ValueError, match="record_thin"):
            sample_chain(kern, KEY, theta0, EMPTY, 120, 40, record_thin=7)

    def test_summarize_run_accept_stat(self):
        """NUTS runs expose accept_stat (the mean Metropolis statistic) as
        the like-for-like acceptance metric: its `accepted` key means
        'sample moved', a different semantic from MH-family kernels."""
        from eeyore_tpu.samplers import NUTS, summarize_run

        kern = NUTS(bvn_model(), step=0.5, max_depth=5)
        theta0s = jax.random.normal(jax.random.PRNGKey(3), (4, 2))
        arrays = sample_chains(kern, KEY, theta0s, EMPTY, 200, 0,
                               return_arrays=True)
        summary = summarize_run(arrays)
        assert 0.0 < summary["accept_stat_mean"] <= 1.0


class TestMinibatchMode:
    def test_recompute_current_runs(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 2))
        y = (x.sum(axis=1, keepdims=True) > 0).astype(x.dtype)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        from eeyore_tpu.datasets import BatchSchedule, XYDataset

        sched = BatchSchedule.from_dataset(XYDataset(np.asarray(x), np.asarray(y)),
                                           batch_size=8, key=jax.random.PRNGKey(1))
        assert sched.num_batches == 4
        kern = MetropolisHastings(model, scale=0.1)
        chain = sample_chain(kern, KEY, jnp.zeros(model.num_params), sched, 400, 100)
        assert kern.recompute_current
        assert 0.0 < chain.acceptance_rate() < 1.0


class TestGibbs:
    def test_xor_posterior_runs_and_blocks(self):
        x, y = xor_data()
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        kern = Gibbs(model, scales=0.5)
        chain = sample_chain(kern, KEY, jnp.zeros(model.num_params), (x, y), 2000, 500)
        acc = chain.block_acceptance_rate()
        assert acc.shape == (3,)
        assert np.all(acc > 0.05) and np.all(acc < 1.0)

    def test_subblocking(self):
        x, y = xor_data()
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        kern = Gibbs(model, scales=0.5, node_subblock_size=[1, 1, 2])
        # width-3 blocks: chunk_evenly(n=1) -> 3 singleton sub-blocks,
        # chunk_evenly(n=2) -> one 3-element chunk (reference semantics)
        assert kern.num_sub_blocks == 7
        chain = sample_chain(kern, KEY, jnp.zeros(model.num_params), (x, y), 500, 100)
        assert chain.block_acceptance_rate().shape == (7,)

    def test_save_blocks(self, tmp_path):
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        kern = Gibbs(model)
        path = tmp_path / "blocks.json"
        kern.save_blocks(path)
        import json

        assert json.load(open(path)) == [[[0, 1, 4]], [[2, 3, 5]], [[6, 7, 8]]]

    def test_gibbs_recovers_bvn(self):
        """Blocked Gibbs on a distribution model with manual 1-coord blocks."""
        model = bvn_model()
        model.num_par_blocks = lambda: 2
        model.par_block_indices = lambda b: [b]
        kern = Gibbs(model, scales=1.0)
        chain = sample_chain(kern, KEY, THETA0, EMPTY, 12000, 2000)
        check_moments(chain.get_samples())


class TestDEMC:
    def test_recovers_bvn(self):
        theta0s = jax.random.normal(jax.random.PRNGKey(5), (20, 2)) * 2
        chains = sample_population(DEMC(bvn_model()), KEY, theta0s, EMPTY, 4000, 1000)
        pooled = chains.get_samples().reshape(-1, 2)
        check_moments(pooled, mean_tol=0.08, cov_tol=0.15)

    def test_partners_distinct(self):
        kern = DEMC(bvn_model())
        a, b = kern._partners(jax.random.PRNGKey(0), 16)
        idx = jnp.arange(16)
        assert not np.any(np.asarray(a == idx))
        assert not np.any(np.asarray(b == idx))
        assert not np.any(np.asarray(a == b))


class TestPowerPosterior:
    @pytest.mark.parametrize("scheme", ["categorical", "even_odd"])
    def test_cold_chain_recovers_target(self, scheme):
        pp = PowerPosteriorSampler(bvn_model(), num_chains=4, sampler="MALA",
                                   sampler_kwargs={"step": 0.5}, between_step=10,
                                   swap_scheme=scheme)
        chains = pp.run(KEY, THETA0, EMPTY, 6000, 1000)
        cold = chains.get_chain(pp.default_indicator())
        check_moments(cold, mean_tol=0.15, cov_tol=0.25)

    def test_default_temperatures(self):
        from eeyore_tpu.samplers import default_temperatures

        temps = default_temperatures(4)
        np.testing.assert_allclose(temps, [(1/4)**4, (2/4)**4, (3/4)**4, 1.0])

    def test_swap_probs_normalized(self):
        from eeyore_tpu.samplers import categorical_swap_probs

        P = categorical_swap_probs(6, b=0.5)
        np.testing.assert_allclose(P.sum(axis=1), np.ones(6), rtol=1e-12)
        assert np.all(np.diag(P) == 0)

    def test_equal_temperature_swaps_always_accept(self):
        """With an all-equal temperature ladder, the even/odd swap log-rate is
        exactly 0 (pi_i == pi_j), so every valid pair must swap — pins the
        cross-temperature log-rate algebra."""
        pp = PowerPosteriorSampler(bvn_model(), num_chains=4, sampler="MALA",
                                   sampler_kwargs={"step": 0.3},
                                   temperature=[1.0, 1.0, 1.0, 1.0],
                                   between_step=1, swap_scheme="even_odd")
        x, y = EMPTY
        state = pp.init(jnp.asarray([[0., 0.], [1., 1.], [2., 2.], [3., 3.]]), x, y)
        inner = pp._between_moves_even_odd(jax.random.PRNGKey(0), state.inner, x, y,
                                           jnp.asarray(0))
        # parity 0 pairs: (0,1), (2,3) -> samples exchanged
        s = np.asarray(inner.sample)
        np.testing.assert_allclose(s[0], [1.0, 1.0])
        np.testing.assert_allclose(s[1], [0.0, 0.0])
        np.testing.assert_allclose(s[2], [3.0, 3.0])
        np.testing.assert_allclose(s[3], [2.0, 2.0])

    def test_mh_ladder(self):
        pp = PowerPosteriorSampler(bvn_model(), num_chains=3,
                                   sampler="MetropolisHastings",
                                   sampler_kwargs={"scale": 0.8}, between_step=5)
        chains = pp.run(KEY, THETA0, EMPTY, 2000, 500)
        assert chains.num_chains() == 3


class _ConjugateNormal(BayesianModel):
    """theta ~ N(0,1), y | theta ~ N(theta, 1): closed-form posterior and
    evidence for SMC validation."""

    def __init__(self):
        super().__init__(loss=lambda pred, y: 0.5 * jnp.sum((pred - y) ** 2))
        from eeyore_tpu.models import IIDNormalPrior

        self.num_params = 1
        self.prior = IIDNormalPrior.standard(1)

    def forward(self, theta, x):
        return jnp.broadcast_to(theta, x.shape[:1] + (1,))


class TestScanCaches:
    def test_smc_reuses_compiled_anneal(self):
        # round 5: repeated runs over the same data objects must reuse the
        # compiled program (a fresh jit(closure) per call retraced the
        # whole stage scan every time)
        import jax.numpy as jnp

        from eeyore_tpu.models import DistributionModel

        dm = DistributionModel(lambda t, x, y: -0.5 * t @ t, num_params=2)
        smc = SMCSampler(dm, num_particles=256, num_mutation_steps=1,
                         mutation="MH", mutation_step=0.5,
                         init_sampler=lambda k, n: jax.random.normal(k, (n, 2)),
                         base_log_pdf=lambda t: -0.5 * t @ t)
        data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        smc.run(jax.random.PRNGKey(0), data)
        fns = [v[0] for v in smc._scan_cache.values()]
        smc.run(jax.random.PRNGKey(1), data)
        assert [v[0] for v in smc._scan_cache.values()] == fns

    def test_population_reuses_compiled_scan(self):
        import jax.numpy as jnp

        from eeyore_tpu.models import DistributionModel
        from eeyore_tpu.samplers import PowerPosteriorSampler

        dm = DistributionModel(lambda t, x, y: -0.5 * t @ t, num_params=2)
        pp = PowerPosteriorSampler(dm, num_chains=4, sampler="MALA",
                                   sampler_kwargs={"step": 0.3},
                                   swap_scheme="even_odd")
        data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        pp.run(jax.random.PRNGKey(0), jnp.zeros(2), data, 12, 4)
        fns = [v[0] for v in pp._pop_jit_cache.values()]
        pp.run(jax.random.PRNGKey(1), jnp.zeros(2), data, 12, 4)
        assert [v[0] for v in pp._pop_jit_cache.values()] == fns


class TestSMC:
    def test_conjugate_posterior_and_evidence(self):
        model = _ConjugateNormal()
        y0 = 1.0
        data = (jnp.zeros((1, 1)), jnp.full((1, 1), y0))
        smc = SMCSampler(model, num_particles=4096, mutation="MALA",
                         mutation_step=0.5, num_mutation_steps=3)
        state, diags = smc.run(jax.random.PRNGKey(0), data)
        post_mean = float(SMCSampler.estimate(state)[0])
        # posterior: N(y0/2, 1/2); evidence: N(y0; 0, 2)
        assert abs(post_mean - y0 / 2) < 0.05
        var = float(SMCSampler.estimate(state, lambda t: t[0] ** 2)) - post_mean**2
        assert abs(var - 0.5) < 0.07
        # lik here is the unnormalized exp(-0.5 (y-theta)^2), so
        # Z = sqrt(2 pi) * N(y0; 0, 2) = exp(-1/4 - log(2)/2)
        expected_log_z = -y0**2 / (2 * 2.0) - 0.5 * np.log(2.0)
        assert abs(diags["log_evidence"] - expected_log_z) < 0.05

    def test_adaptive_betas_same_evidence_fewer_stages(self):
        """betas='adaptive' (ESS-bisection tempering) must reach the same
        closed-form posterior/evidence as the fixed quartic ladder while
        spending FEWER stages — the ladder concentrates where the path
        bends instead of following (i/10)^4."""
        model = _ConjugateNormal()
        y0 = 1.0
        data = (jnp.zeros((1, 1)), jnp.full((1, 1), y0))
        smc = SMCSampler(model, num_particles=4096, betas="adaptive",
                         mutation="MALA", mutation_step=0.5,
                         num_mutation_steps=3, adaptive_target_ess=0.5)
        state, diags = smc.run(jax.random.PRNGKey(0), data)
        post_mean = float(SMCSampler.estimate(state)[0])
        assert abs(post_mean - y0 / 2) < 0.05
        expected_log_z = -y0**2 / (2 * 2.0) - 0.5 * np.log(2.0)
        assert abs(diags["log_evidence"] - expected_log_z) < 0.05
        # quartic default = 10 stages; this easy path needs far fewer
        assert 1 <= diags["num_stages"] < 10
        betas = np.asarray(diags["beta"])
        assert betas[-1] == 1.0
        assert np.all(np.diff(betas) > 0)

    def test_adaptive_betas_hard_path_adds_stages(self):
        """Far data makes the prior->posterior path harder: the adaptive
        ladder must respond with more (still finite) stages and keep the
        final weight distribution healthy."""
        model = _ConjugateNormal()
        data = (jnp.zeros((1, 1)), jnp.full((1, 1), 6.0))
        easy = SMCSampler(model, num_particles=2048, betas="adaptive",
                          mutation="MALA", mutation_step=0.5,
                          num_mutation_steps=2)
        hard = SMCSampler(model, num_particles=2048, betas="adaptive",
                          mutation="MALA", mutation_step=0.5,
                          num_mutation_steps=2)
        _, diags_easy = easy.run(jax.random.PRNGKey(1),
                                 (jnp.zeros((1, 1)), jnp.full((1, 1), 1.0)))
        state, diags_hard = hard.run(jax.random.PRNGKey(1), data)
        assert diags_hard["num_stages"] >= diags_easy["num_stages"]
        assert diags_hard["num_stages"] < hard.max_stages
        # posterior N(3, 1/2)
        post_mean = float(SMCSampler.estimate(state)[0])
        assert abs(post_mean - 3.0) < 0.1

    def test_adaptive_binding_constraint_resamples_no_stall(self):
        """When the ESS bisection's constraint binds (beta < 1), the landed
        ESS sits marginally ABOVE the resample threshold — without the
        forced resample the ladder stalls at duplicate 1e-6 advances
        (observed on a concentrated target before the round-4 fix). Pin:
        every non-final adaptive stage resamples, and consecutive betas
        advance by real amounts."""
        model = _ConjugateNormal()
        data = (jnp.zeros((1, 1)), jnp.full((1, 1), 6.0))  # concentrated
        smc = SMCSampler(model, num_particles=1024, betas="adaptive",
                         mutation="MALA", mutation_step=0.5,
                         num_mutation_steps=2)
        _, diags = smc.run(jax.random.PRNGKey(2), data)
        betas = np.asarray(diags["beta"])
        resampled = np.asarray(diags["resampled"])
        assert diags["num_stages"] >= 2
        # all binding stages resample
        assert np.all(resampled[betas < 1.0])
        # no stalled duplicate advances
        diffs = np.diff(np.concatenate([[0.0], betas]))
        assert np.all(diffs > 1e-4)

    def test_resampling_triggers_and_ess_tracked(self):
        model = _ConjugateNormal()
        data = (jnp.zeros((1, 1)), jnp.full((1, 1), 6.0))  # far data -> weight collapse
        smc = SMCSampler(model, num_particles=512, betas=[0.0, 0.5, 1.0],
                         mutation="MH", mutation_step=0.5, num_mutation_steps=2,
                         ess_threshold=0.9)
        state, diags = smc.run(jax.random.PRNGKey(0), data)
        assert np.any(diags["resampled"])
        assert np.all(diags["ess"] > 0)

    def test_systematic_resample_unbiased(self):
        from eeyore_tpu.samplers import systematic_resample_indices

        w = jnp.asarray([0.5, 0.25, 0.125, 0.125])
        counts = np.zeros(4)
        for s in range(200):
            idx = systematic_resample_indices(jax.random.PRNGKey(s), w)
            counts += np.bincount(np.asarray(idx), minlength=4)
        freq = counts / counts.sum()
        np.testing.assert_allclose(freq, np.asarray(w), atol=0.02)

    def test_distribution_target_via_base(self):
        smc = SMCSampler(
            bvn_model(), num_particles=1024, mutation="MH", mutation_step=0.5,
            init_sampler=lambda key, n: 3.0 * jax.random.normal(key, (n, 2)),
            base_log_pdf=lambda t: jnp.sum(-0.5 * t**2 / 9.0),
        )
        state, diags = smc.run(jax.random.PRNGKey(0), EMPTY)
        mean = np.asarray(SMCSampler.estimate(state))
        assert np.all(np.abs(mean) < 0.2)
