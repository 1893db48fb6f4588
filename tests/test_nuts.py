"""NUTS: checkpoint-stack combinatorics, statistical correctness on
closed-form targets, divergence handling, and dual-averaging adaptation.

The checkpoint scheme is pinned against a brute-force enumeration of the
complete binary subtrees (the oracle the bit-tricks must reproduce); the
sampler itself is validated the way the reference validates samplers — on
targets with known moments (SURVEY.md section 4, point 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eeyore_tpu.models import DistributionModel
from eeyore_tpu.samplers import NUTS, sample_chain, sample_chains
from eeyore_tpu.samplers.nuts import _popcount, _trailing_ones
from eeyore_tpu.tuners.dual_averaging import HMCDATuner


class TestCheckpointCombinatorics:
    """Leaf n is stored at slot popcount(n) when even; when odd it checks
    slots [popcount(n)-trailing_ones(n), popcount(n)-1]. The oracle: a
    complete subtree of size 2^m ends at leaf n iff (n+1) % 2^m == 0, and
    its start leaf s = n - 2^m + 1 must sit at the slot the check reads."""

    def test_check_ranges_cover_exactly_the_complete_subtrees(self):
        max_leaves = 1024
        ns = jnp.arange(max_leaves, dtype=jnp.int32)
        pcs = np.asarray(_popcount(ns))
        tos = np.asarray(_trailing_ones(ns))

        slot_of = {}  # start-leaf -> its checkpoint slot at store time
        for n in range(max_leaves):
            if n % 2 == 0:
                slot_of[n] = pcs[n]
                continue
            # oracle: the subtrees ending at this odd leaf
            expected_starts = []
            m = 1
            while (n + 1) % (1 << m) == 0:
                expected_starts.append(n - (1 << m) + 1)
                m += 1
            expected_slots = sorted(slot_of[s] for s in expected_starts)
            got_slots = list(range(pcs[n] - tos[n], pcs[n]))
            assert got_slots == expected_slots, f"leaf {n}"
            # and no live checkpoint outside the range is clobbered later:
            # starts of still-open subtrees keep their slots
            live = {s: slot_of[s] for s in slot_of
                    if s % 2 == 0 and any((s % (1 << mm) == 0 and s + (1 << mm) - 1 > n)
                                          for mm in range(1, 11))}
            assert len(set(live.values())) == len(live), f"slot collision at leaf {n}"

    def test_slots_stay_within_stack(self):
        # for trees up to depth 10 the store slot never exceeds max_depth-1
        ns = jnp.arange(0, 1 << 10, 2, dtype=jnp.int32)
        assert int(jnp.max(_popcount(ns))) <= 9


def _gaussian_model(cov):
    prec = jnp.asarray(np.linalg.inv(cov))
    return DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t,
                             num_params=cov.shape[0])


DATA = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))


class TestNUTSStatistical:
    def test_bivariate_normal_moments(self):
        cov = np.array([[1.0, 0.7], [0.7, 1.0]])
        model = _gaussian_model(cov)
        kernel = NUTS(model, step=0.4, max_depth=6)
        chains, state = sample_chains(
            kernel, jax.random.PRNGKey(3),
            jnp.zeros((8, 2)) + jnp.asarray([2.0, -2.0]), DATA,
            num_iters=1500, num_burnin_iters=500, return_state=True,
            return_arrays=True)
        samples = np.asarray(chains["sample"]).reshape(-1, 2)
        n_eff_floor = 500  # conservative: NUTS mixes far better than this
        se = np.sqrt(np.diag(cov) / n_eff_floor)
        assert np.all(np.abs(samples.mean(axis=0)) < 4 * se)
        est_cov = np.cov(samples.T)
        assert np.allclose(est_cov, cov, atol=0.12)
        # trajectory stats are sane
        assert 0.5 < float(np.mean(chains["accept_stat"])) <= 1.0
        assert float(np.mean(chains["depth"])) >= 1.0
        assert float(np.mean(chains["divergent"])) == 0.0

    def test_uturn_terminates_trees(self):
        # an isotropic Gaussian with a well-matched step: trees must stop
        # well short of max_depth (the U-turn criterion fires)
        model = _gaussian_model(np.eye(2))
        kernel = NUTS(model, step=0.8, max_depth=8)
        chain = sample_chain(kernel, jax.random.PRNGKey(0), jnp.zeros(2), DATA,
                             num_iters=200, num_burnin_iters=0)
        depth = np.asarray(chain.vals["depth"])
        assert depth.max() < 8
        assert depth.mean() < 5
        # dynamic trajectories: leapfrog counts vary across transitions
        assert len(np.unique(np.asarray(chain.vals["num_leapfrogs"]))) > 1

    def test_divergence_flag_and_finiteness(self):
        # absurd step size on a narrow Gaussian: divergences must be flagged
        # and the sampler must hold its ground (finite samples)
        cov = np.diag([1.0, 1e-4])
        model = _gaussian_model(cov)
        kernel = NUTS(model, step=5.0, max_depth=6)
        chain = sample_chain(kernel, jax.random.PRNGKey(1), jnp.zeros(2), DATA,
                             num_iters=100, num_burnin_iters=0)
        samples = np.asarray(chain.get_samples())
        assert np.all(np.isfinite(samples))
        assert np.asarray(chain.vals["divergent"]).mean() > 0.5

    def test_dual_averaging_adapts_step(self):
        cov = np.array([[1.0, 0.9], [0.9, 1.0]])
        model = _gaussian_model(cov)
        kernel = NUTS(model, step=1.0, max_depth=8, tuner=HMCDATuner(l=1.0, d=0.8))  # l is inert: NUTS sets its own trajectory
        chain, state = sample_chain(
            kernel, jax.random.PRNGKey(2), jnp.asarray([1.0, -1.0]), DATA,
            num_iters=1200, num_burnin_iters=600, return_state=True)
        tuned = float(state.step)
        assert np.isfinite(tuned) and 0 < tuned < 1.0
        post_accept = float(np.mean(np.asarray(chain.vals["accept_stat"])))
        assert 0.6 < post_accept <= 1.0

    def test_matches_hmc_posterior(self):
        # same target, NUTS vs HMC: pooled means must agree within MC error
        from eeyore_tpu.samplers import HMC

        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        model = _gaussian_model(cov)
        key = jax.random.PRNGKey(7)
        theta0s = jnp.zeros((4, 2))
        nuts_rec = sample_chains(NUTS(model, step=0.5, max_depth=6), key, theta0s,
                                 DATA, num_iters=1500, num_burnin_iters=500,
                                 return_arrays=True)
        hmc_rec = sample_chains(HMC(model, step=0.5, num_steps=8), key, theta0s,
                                DATA, num_iters=1500, num_burnin_iters=500,
                                return_arrays=True)
        nuts_mean = np.asarray(nuts_rec["sample"]).reshape(-1, 2).mean(axis=0)
        hmc_mean = np.asarray(hmc_rec["sample"]).reshape(-1, 2).mean(axis=0)
        assert np.all(np.abs(nuts_mean - hmc_mean) < 0.25)


class TestMassAdaptation:
    def test_metric_learns_scales_and_cheapens_trajectories(self):
        # badly-scaled Gaussian: the warmed-up diagonal metric must recover
        # the marginal variances and make trajectories cheaper than the
        # unit-metric sampler's
        var = np.array([25.0, 1.0, 0.04])
        model = _gaussian_model(np.diag(var))
        key = jax.random.PRNGKey(5)
        theta0 = jnp.zeros(3)

        adapt = NUTS(model, step=0.5, max_depth=10, tuner=HMCDATuner(l=1.0),
                     mass_adapt=True)
        chain, state = sample_chain(adapt, key, theta0, DATA, num_iters=3000,
                                    num_burnin_iters=1500, return_state=True)
        inv_mass = np.asarray(state.inv_mass)
        ratio = inv_mass / var
        assert np.all(ratio > 0.2) and np.all(ratio < 5.0), ratio

        plain = NUTS(model, step=0.5, max_depth=10, tuner=HMCDATuner(l=1.0))
        chain0 = sample_chain(plain, key, theta0, DATA, num_iters=3000,
                              num_burnin_iters=1500)
        cost_adapt = float(np.mean(np.asarray(chain.vals["num_leapfrogs"])))
        cost_plain = float(np.mean(np.asarray(chain0.vals["num_leapfrogs"])))
        assert cost_adapt < cost_plain

        # and the target is still sampled correctly
        s = np.asarray(chain.get_samples())
        est_var = s.var(axis=0)
        assert np.all(est_var / var > 0.5) and np.all(est_var / var < 2.0)
        assert 0.5 < float(np.mean(np.asarray(chain.vals["accept_stat"]))) <= 1.0

    def test_mass_adapt_off_keeps_unit_metric(self):
        model = _gaussian_model(np.diag([4.0, 1.0]))
        kernel = NUTS(model, step=0.5, max_depth=6)
        _, state = sample_chain(kernel, jax.random.PRNGKey(0), jnp.zeros(2),
                                DATA, num_iters=100, num_burnin_iters=50,
                                return_state=True)
        assert np.allclose(np.asarray(state.inv_mass), 1.0)
        assert int(state.wf_n) == 0


class TestNUTSSharded:
    def test_nuts_shards_over_chain_mesh(self):
        # dynamic trajectories inside shard_map-style partitioning: the
        # while_loops are per-chain, so the program still has no collectives
        from jax.sharding import Mesh
        from eeyore_tpu.parallel import sample_chains_sharded

        cov = np.array([[1.0, 0.5], [0.5, 1.0]])
        model = _gaussian_model(cov)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("chains",))
        kernel = NUTS(model, step=0.5, max_depth=5)
        recorded, state = sample_chains_sharded(
            kernel, jax.random.PRNGKey(0), jnp.zeros((16, 2)), DATA,
            num_iters=300, num_burnin_iters=100, mesh=mesh)
        samples = np.asarray(recorded["sample"])
        assert samples.shape == (16, 200, 2)
        assert np.all(np.isfinite(samples))
        pooled = samples.reshape(-1, 2)
        assert np.all(np.abs(pooled.mean(axis=0)) < 0.3)


class TestNUTSOnModel:
    def test_xor_mlp_runs_and_mixes(self):
        from eeyore_tpu.models import MLP, loss_functions, mlp

        x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
        y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        kernel = NUTS(model, step=0.1, max_depth=6)
        chain = sample_chain(kernel, jax.random.PRNGKey(0),
                             0.1 * jnp.ones(model.num_params), (x, y),
                             num_iters=300, num_burnin_iters=100)
        samples = np.asarray(chain.get_samples())
        assert samples.shape == (200, model.num_params)
        assert np.all(np.isfinite(samples))
        assert float(np.mean(np.asarray(chain.vals["accept_stat"]))) > 0.5


class TestFixedBudget:
    """fixed_budget=True replaces the lockstep while_loops with static
    control flow (unrolled doublings + fori_loop subtrees) whose masked
    algebra must reproduce the adaptive transition EXACTLY: same keys, same
    max_depth => bit-identical chains."""

    def test_bit_identical_to_adaptive(self):
        model = _gaussian_model(np.array([[1.0, 0.6], [0.6, 1.0]]))
        data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        key = jax.random.PRNGKey(11)
        theta0 = jnp.asarray([0.3, -0.2])
        for depth in (2, 3, 4):
            ada = sample_chain(NUTS(model, step=0.4, max_depth=depth), key,
                               theta0, data, num_iters=200, jit=True)
            fix = sample_chain(NUTS(model, step=0.4, max_depth=depth,
                                    fixed_budget=True), key, theta0, data,
                               num_iters=200, jit=True)
            np.testing.assert_array_equal(np.asarray(fix.get_samples()),
                                          np.asarray(ada.get_samples()))
            np.testing.assert_array_equal(np.asarray(fix.vals["depth"]),
                                          np.asarray(ada.vals["depth"]))
            np.testing.assert_array_equal(np.asarray(fix.vals["num_leapfrogs"]),
                                          np.asarray(ada.vals["num_leapfrogs"]))
            np.testing.assert_array_equal(np.asarray(fix.vals["divergent"]),
                                          np.asarray(ada.vals["divergent"]))

    def test_bit_identical_with_divergences(self):
        # huge step: divergences + early stops exercise the masked paths
        model = _gaussian_model(np.array([[1.0, 0.0], [0.0, 1.0]]))
        data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        key = jax.random.PRNGKey(13)
        theta0 = jnp.asarray([2.0, -2.0])
        ada = sample_chain(NUTS(model, step=5.0, max_depth=4), key, theta0,
                           data, num_iters=150, jit=True)
        fix = sample_chain(NUTS(model, step=5.0, max_depth=4,
                                fixed_budget=True), key, theta0, data,
                           num_iters=150, jit=True)
        np.testing.assert_array_equal(np.asarray(fix.get_samples()),
                                      np.asarray(ada.get_samples()))
        np.testing.assert_array_equal(np.asarray(fix.vals["divergent"]),
                                      np.asarray(ada.vals["divergent"]))

    def test_vmapped_chains_match(self):
        model = _gaussian_model(np.array([[1.0, 0.6], [0.6, 1.0]]))
        data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        key = jax.random.PRNGKey(17)
        theta0s = 0.3 * jax.random.normal(jax.random.PRNGKey(18), (16, 2))
        ada = sample_chains(NUTS(model, step=0.4, max_depth=3), key, theta0s,
                            data, num_iters=120, return_arrays=True)
        fix = sample_chains(NUTS(model, step=0.4, max_depth=3,
                                 fixed_budget=True), key, theta0s, data,
                            num_iters=120, return_arrays=True)
        np.testing.assert_array_equal(np.asarray(fix["sample"]),
                                      np.asarray(ada["sample"]))


class TestChooseMaxDepth:
    """Auto depth/budget selection (samplers/nuts.py choose_max_depth):
    adaptive-NUTS warmup -> freeze max_depth at the chosen quantile of kept
    tree depths -> run fixed-budget at that depth. Removes the hand-picked
    max_depth footgun documented at nuts.py fixed_budget."""

    def test_probe_matches_adaptive_depth_profile(self):
        from eeyore_tpu.samplers import choose_max_depth

        model = _gaussian_model(np.array([[1.0, 0.6], [0.6, 1.0]]))
        theta0s = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, 2))
        d, step = choose_max_depth(model, DATA, step=0.4, num_warmup=200,
                                   theta0s=theta0s, key=jax.random.PRNGKey(2))
        # well-matched step on a 2d Gaussian: adaptive trees stay shallow,
        # and the probe must NOT hand back the 10-level default budget
        assert 1 <= d <= 4
        assert 0.0 < step < 5.0
        # the frozen depth really covers the adaptive depth profile: rerun
        # adaptive at the tuned step and check the quantile is covered
        kernel = NUTS(model, step=step, max_depth=10)
        chains = sample_chains(kernel, jax.random.PRNGKey(3), theta0s, DATA,
                               num_iters=200, num_burnin_iters=100,
                               return_arrays=True)
        depths = np.asarray(chains["depth"])
        assert d >= np.quantile(depths, 0.80)  # probe quantile=0.95, slack

    def test_end_to_end_fixed_budget_moments(self):
        from eeyore_tpu.samplers import choose_max_depth

        cov = np.array([[1.0, 0.7], [0.7, 1.0]])
        model = _gaussian_model(cov)
        theta0s = jnp.zeros((8, 2)) + jnp.asarray([2.0, -2.0])
        d, step = choose_max_depth(model, DATA, step=0.4, num_warmup=200,
                                   theta0s=theta0s, key=jax.random.PRNGKey(5))
        kernel = NUTS(model, step=step, max_depth=d, fixed_budget=True)
        chains = sample_chains(kernel, jax.random.PRNGKey(6), theta0s, DATA,
                               num_iters=1500, num_burnin_iters=500,
                               return_arrays=True)
        samples = np.asarray(chains["sample"]).reshape(-1, 2)
        se = np.sqrt(np.diag(cov) / 500)
        assert np.all(np.abs(samples.mean(axis=0)) < 4 * se)
        assert np.allclose(np.cov(samples.T), cov, atol=0.12)
        assert 0.5 < float(np.mean(chains["accept_stat"])) <= 1.0

    def test_xor_mlp_probe(self):
        from eeyore_tpu.models import MLP, loss_functions, mlp
        from eeyore_tpu.samplers import choose_max_depth

        x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
        y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        # no theta0s: prior-sampled inits (the model has a prior)
        d, step = choose_max_depth(model, (x, y), step=0.1, num_warmup=128,
                                   num_chains=8, key=jax.random.PRNGKey(7))
        assert 1 <= d <= 6  # the XOR posterior uses depth 3-5 trees
        assert step > 0.0


class TestAutoDepth:
    """max_depth="auto": the choose_max_depth probe runs inside the sampler
    the first time it sees data (reference precedent: init_step warmup runs
    inside HMC, reference hmc.py:38-77) and the kernel becomes eligible for
    fixed-budget dispatch."""

    def _xor(self):
        from eeyore_tpu.models import MLP, loss_functions, mlp

        x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
        y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        return model, (x, y)

    def test_resolve_auto_budget_freezes_depth_and_step(self):
        model, data = self._xor()
        kernel = NUTS(model, step=0.1, max_depth="auto")
        assert kernel.auto_depth and kernel.max_depth == 10
        kernel.resolve_auto_budget(data, key=jax.random.PRNGKey(0),
                                   num_warmup=64, num_chains=4)
        assert isinstance(kernel.max_depth, int) and 1 <= kernel.max_depth <= 10
        assert kernel.step0 > 0.0
        fp = kernel._auto_fingerprint
        assert fp is not None
        # idempotent for the same data
        d, s = kernel.max_depth, kernel.step0
        kernel.resolve_auto_budget(data, key=jax.random.PRNGKey(9))
        assert (kernel.max_depth, kernel.step0) == (d, s)

    def test_auto_depth_dispatches_fixed_budget(self):
        from eeyore_tpu.samplers.dispatch import resolve_backend

        model, data = self._xor()
        kernel = NUTS(model, step=0.1, max_depth="auto")
        # unresolved: not eligible
        plan, reason = resolve_backend(kernel, data, 8192, 256, platform="tpu")
        assert plan is None
        kernel.resolve_auto_budget(data, key=jax.random.PRNGKey(0),
                                   num_warmup=64, num_chains=4)
        plan, reason = resolve_backend(kernel, data, 8192, 256, platform="tpu")
        assert plan is not None, reason
        assert plan.maker.__name__ == "make_resident_nuts_dense"
        assert plan.kwargs["max_depth"] == kernel.max_depth

    def test_sample_chains_runs_probe_automatically(self):
        model, data = self._xor()
        kernel = NUTS(model, step=0.1, max_depth="auto")
        # pre-resolve with a small probe so the in-run hook is a no-op
        kernel.resolve_auto_budget(data, key=jax.random.PRNGKey(1),
                                   num_warmup=32, num_chains=2)
        theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                          (2, model.num_params))
        out = sample_chains(kernel, jax.random.PRNGKey(3), theta0s, data,
                            num_iters=8, return_arrays=True, backend="scan")
        assert out["sample"].shape == (2, 8, model.num_params)


class TestFrozenMetricBridge:
    """mass_adapt x kernels: choose_max_depth(return_metric=True) freezes
    the probe's diagonal metric, resolve_auto_budget stores it, and the
    NUTS dispatch plan carries it to the kernels (round-4 VERDICT weak 4:
    metric-needing targets previously stayed silently at scanned speed)."""

    def test_probe_returns_metric_matching_target_scales(self):
        from eeyore_tpu.samplers import choose_max_depth

        var = np.array([9.0, 0.25])
        model = _gaussian_model(np.diag(var))
        theta0s = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (8, 2))
        d, step, inv_mass = choose_max_depth(
            model, DATA, step=0.4, num_warmup=400, theta0s=theta0s,
            key=jax.random.PRNGKey(1), mass_adapt=True, return_metric=True)
        assert inv_mass.shape == (2,) and np.all(inv_mass > 0)
        # frozen M^-1 ~ posterior variances: the 36x scale ratio must show
        ratio = inv_mass[0] / inv_mass[1]
        assert ratio > 4.0, (inv_mass, d, step)

    def test_auto_mass_adapt_dispatches_with_frozen_metric(self):
        from eeyore_tpu.models import MLP, loss_functions, mlp
        from eeyore_tpu.samplers.dispatch import resolve_backend

        x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
        y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        kernel = NUTS(model, step=0.1, max_depth="auto", mass_adapt=True)
        # unresolved: ineligible (auto not yet probed)
        plan, reason = resolve_backend(kernel, (x, y), 8192, 256,
                                       platform="tpu")
        assert plan is None
        # an explicit fixed-budget mass_adapt kernel without a frozen
        # metric gets the frozen-metric hint
        k2 = NUTS(model, step=0.1, max_depth=3, fixed_budget=True,
                  mass_adapt=True)
        plan, reason = resolve_backend(k2, (x, y), 8192, 256, platform="tpu")
        assert plan is None and "FROZEN" in reason
        kernel.resolve_auto_budget((x, y), key=jax.random.PRNGKey(0),
                                   num_warmup=64, num_chains=4)
        assert kernel._frozen_inv_mass is not None
        plan, reason = resolve_backend(kernel, (x, y), 8192, 256,
                                       platform="tpu")
        assert plan is not None, reason
        np.testing.assert_allclose(plan.kwargs["inv_mass"],
                                   kernel._frozen_inv_mass)

    def test_metric_kernel_maker_accepts_inv_mass(self):
        # construction-time contract only (lowering is TPU-only): the
        # makers accept [P] metrics and reject non-positive ones
        from eeyore_tpu.models import MLP, loss_functions, mlp
        from eeyore_tpu.ops.resident_nuts import make_resident_nuts
        from eeyore_tpu.ops.resident_nuts_dense import make_resident_nuts_dense

        x = np.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
        y = np.asarray([[0.0], [1.0], [1.0], [0.0]])
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        P = model.num_params
        make_resident_nuts_dense(model, x, y, step=0.1, max_depth=3,
                                 num_iters=8, inv_mass=np.ones(P))
        make_resident_nuts(model, x, y, step=0.1, max_depth=3,
                           num_iters=8, chain_block=128,
                           inv_mass=np.full(P, 0.5))
        with pytest.raises(ValueError, match="positive"):
            make_resident_nuts_dense(model, x, y, step=0.1, max_depth=3,
                                     num_iters=8, inv_mass=np.zeros(P))


class TestESSCriterion:
    def test_ess_criterion_picks_cheapest_adequate_depth(self):
        # on a Gaussian where per-sample ESS saturates quickly, the
        # ESS-per-leapfrog criterion must not exceed the quantile choice
        # (kernels run leapfrogs at a ~constant rate, so ESS/leapfrog
        # tracks kernel ESS/s — benchmarks/NUTS_DEPTH_ESS.json)
        from eeyore_tpu.samplers import choose_max_depth

        cov = np.array([[1.0, 0.7], [0.7, 1.0]])
        model = _gaussian_model(cov)
        theta0s = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (8, 2))
        d_q, step_q = choose_max_depth(model, DATA, step=0.4, num_warmup=128,
                                       theta0s=theta0s,
                                       key=jax.random.PRNGKey(1))
        d_e, step_e = choose_max_depth(model, DATA, step=0.4, num_warmup=128,
                                       theta0s=theta0s,
                                       key=jax.random.PRNGKey(1),
                                       criterion="ess")
        assert 1 <= d_e <= d_q, (d_e, d_q)
        assert step_e == step_q  # the step comes from the same warmup

    def test_unknown_criterion_raises(self):
        from eeyore_tpu.samplers import choose_max_depth

        model = _gaussian_model(np.eye(2))
        with pytest.raises(ValueError, match="criterion"):
            choose_max_depth(model, DATA, step=0.4, num_warmup=32,
                             theta0s=jnp.zeros((4, 2)), criterion="bogus")
