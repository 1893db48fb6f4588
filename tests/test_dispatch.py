"""Kernel-backend dispatch contract (samplers/dispatch.py): eligible
configs resolve onto the resident/dense Pallas kernels, ineligible ones
fall back to the scanned path — and the public API's backend="auto" default
is a no-op off-TPU.

The kernels themselves are TPU-only (on-core PRNG); these tests pin the
RESOLUTION logic by passing platform="tpu" explicitly, and the fallback
identity by running on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eeyore_tpu.models import DistributionModel, MLP, loss_functions, mlp
from eeyore_tpu.samplers import (
    HMC, MALA, Gibbs, MetropolisHastings, NUTS, sample_chains,
)
from eeyore_tpu.samplers.dispatch import resolve_backend
from eeyore_tpu.tuners.dual_averaging import HMCDATuner

XOR = (jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]]),
       jnp.asarray([[0.0], [1.0], [1.0], [0.0]]))


def xor_model():
    return MLP(loss=loss_functions["binary_classification"],
               hparams=mlp.Hyperparameters(dims=[2, 2, 1]))


def iris_like_data(n=152):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, 4))
    y = jax.nn.one_hot(jax.random.randint(key, (n,), 0, 3), 3)
    return x, y


def iris_model():
    return MLP(loss=loss_functions["multiclass_classification"],
               hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                           activations=[mlp.sigmoid, None]))


class TestResolve:
    def test_xor_samplers_resolve_dense(self):
        model = xor_model()
        for kernel, maker in [
            (MetropolisHastings(model, scale=0.1), "make_resident_mh_dense"),
            (MALA(model, step=0.01), "make_resident_mala_dense"),
            (HMC(model, step=0.05, num_steps=10), "make_resident_hmc_dense"),
            (Gibbs(model), "make_resident_gibbs_dense"),
            (NUTS(model, step=0.1, max_depth=3, fixed_budget=True),
             "make_resident_nuts_dense"),
        ]:
            plan, reason = resolve_backend(kernel, XOR, 8192, 256,
                                           platform="tpu")
            assert plan is not None, (type(kernel).__name__, reason)
            assert plan.backend == "dense"
            assert plan.maker.__name__ == maker
            assert plan.chain_block == 8192

    def test_large_dataset_resolves_resident(self):
        # iris-class data: too many rows to unroll -> sublane kernels, and
        # the streamed HMC caps its block at the measured 256 optimum
        data = iris_like_data()
        plan, _ = resolve_backend(HMC(iris_model(), step=0.02, num_steps=8),
                                  data, 16384, 256, platform="tpu")
        assert plan is not None and plan.backend == "resident"
        assert plan.maker.__name__ == "make_resident_hmc"
        assert plan.chain_block == 256
        plan, _ = resolve_backend(MALA(iris_model(), step=0.01), data,
                                  16384, 256, platform="tpu")
        assert plan is not None and plan.backend == "resident"

    def test_tuner_is_forwarded(self):
        tuner = HMCDATuner(l=0.5)
        kernel = HMC(xor_model(), step=0.05, num_steps=10, tuner=tuner)
        plan, _ = resolve_backend(kernel, XOR, 1024, 256, platform="tpu")
        assert plan is not None and plan.kwargs["tuner"] is tuner
        assert plan.kwargs["l_rounding"] == "round"
        kernel = HMC(xor_model(), step=0.05, num_steps=10, tuner=tuner,
                     l_rounding="stochastic")
        plan, _ = resolve_backend(kernel, XOR, 1024, 256, platform="tpu")
        assert plan is not None and plan.kwargs["l_rounding"] == "stochastic"

    def test_ineligible_falls_back(self):
        model = xor_model()
        # off-TPU
        plan, reason = resolve_backend(HMC(model, step=0.05), XOR, 8192, 256,
                                       platform="cpu")
        assert plan is None and "TPU" in reason
        # chain count not divisible
        plan, reason = resolve_backend(HMC(model, step=0.05), XOR, 1000, 256,
                                       platform="tpu")
        assert plan is None and "divisible" in reason
        # non-architecture model
        dm = DistributionModel(lambda t, x, y: -0.5 * t @ t, num_params=2)
        plan, reason = resolve_backend(MALA(dm, step=0.1), XOR, 8192, 256,
                                       platform="tpu")
        assert plan is None and "kernel-compatible" in reason
        # adaptive NUTS has data-dependent trees
        plan, reason = resolve_backend(NUTS(model, step=0.1, max_depth=6),
                                       XOR, 8192, 256, platform="tpu")
        assert plan is None and "fixed_budget" in reason
        # asymmetric MH proposal
        plan, reason = resolve_backend(
            MetropolisHastings(model, symmetric=False, scale=0.1), XOR,
            8192, 256, platform="tpu")
        assert plan is None and "symmetric" in reason

    def test_minibatch_schedule_is_scan_only(self):
        from eeyore_tpu.datasets import BatchSchedule

        x, y = XOR
        sched = BatchSchedule(jnp.stack([x[:2], x[2:]]),
                              jnp.stack([y[:2], y[2:]]))
        plan, reason = resolve_backend(HMC(xor_model(), step=0.05), sched,
                                       8192, 256, platform="tpu")
        assert plan is None and "full-batch" in reason

    def test_explicit_backend_raises_when_ineligible(self):
        model = xor_model()
        with pytest.raises(ValueError, match="ineligible"):
            resolve_backend(HMC(model, step=0.05), XOR, 8192, 256,
                            platform="cpu", backend="dense")
        # round 4: NUTS gained a sublane variant — explicit "resident" now
        # resolves instead of raising (round 5: depth must sit inside the
        # kernel unroll gate)
        plan, _ = resolve_backend(NUTS(model, step=0.1, max_depth=4,
                                       fixed_budget=True),
                                  XOR, 8192, 256, platform="tpu",
                                  backend="resident")
        assert plan is not None and plan.maker.__name__ == "make_resident_nuts"
        with pytest.raises(ValueError, match="ineligible"):
            # but adaptive NUTS still has no kernel anywhere
            resolve_backend(NUTS(model, step=0.1), XOR, 8192, 256,
                            platform="tpu", backend="resident")
        with pytest.raises(ValueError, match="backend"):
            resolve_backend(HMC(model, step=0.05), XOR, 8192, 256,
                            backend="gpu")

    def test_scan_backend_never_resolves(self):
        plan, reason = resolve_backend(HMC(xor_model(), step=0.05), XOR,
                                       8192, 256, platform="tpu",
                                       backend="scan")
        assert plan is None


class TestRecordKeysGate:
    def test_explicit_extra_keys_force_scan(self):
        # an EXPLICIT request for keys the kernels cannot record must fall
        # back to the scanned path, not silently vanish (round-4 advice)
        model = xor_model()
        plan, reason = resolve_backend(
            MALA(model, step=0.01), XOR, 8192, 256, platform="tpu",
            record_keys=("sample", "grad_val"))
        assert plan is None and "grad_val" in reason
        # sample/accepted subsets stay eligible
        plan, _ = resolve_backend(
            MALA(model, step=0.01), XOR, 8192, 256, platform="tpu",
            record_keys=("sample",))
        assert plan is not None
        plan, _ = resolve_backend(
            MALA(model, step=0.01), XOR, 8192, 256, platform="tpu",
            record_keys=("sample", "accepted"))
        assert plan is not None

    def test_target_val_turns_on_in_kernel_extras(self):
        # round 5: target_val is recorded IN-KERNEL (stage-row packed) —
        # the request resolves to a kernel plan with record_extras=True
        model = xor_model()
        plan, reason = resolve_backend(
            MALA(model, step=0.01), XOR, 8192, 256, platform="tpu",
            record_keys=("sample", "target_val", "accepted"))
        assert plan is not None, reason
        assert plan.kwargs["record_extras"] is True
        # default (no explicit request) keeps the lean record path
        plan, _ = resolve_backend(MALA(model, step=0.01), XOR, 8192, 256,
                                  platform="tpu")
        assert plan is not None and plan.kwargs["record_extras"] is False

    def test_explicit_backend_raises_on_extra_keys(self):
        with pytest.raises(ValueError, match="record_keys"):
            resolve_backend(MALA(xor_model(), step=0.01), XOR, 8192, 256,
                            platform="tpu", backend="dense",
                            record_keys=("grad_val",))

    def test_sample_chains_returns_requested_keys(self):
        # end-to-end: the returned arrays must actually contain the
        # explicitly requested key (scanned fallback on CPU and TPU alike)
        model = xor_model()
        kernel = MALA(model, step=0.01)
        theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                          (4, model.num_params))
        out = sample_chains(kernel, jax.random.PRNGKey(2), theta0s, XOR,
                            num_iters=20, return_arrays=True, backend="auto",
                            record_keys=("sample", "target_val"))
        assert "target_val" in out and out["target_val"].shape == (4, 20)


class TestCacheKeys:
    def test_freeze_distinguishes_kwargs_and_data(self):
        from eeyore_tpu.samplers.dispatch import _data_fingerprint, _freeze

        a = dict(step=0.1, num_steps=10, scales=[1.0, 2.0],
                 temperatures=np.arange(4.0))
        b = dict(step=0.2, num_steps=10, scales=[1.0, 2.0],
                 temperatures=np.arange(4.0))
        c = dict(step=0.1, num_steps=10, scales=[1.0, 2.0],
                 temperatures=np.arange(4.0) + 1)
        assert _freeze(a) == _freeze(dict(a))
        assert _freeze(a) != _freeze(b)
        assert _freeze(a) != _freeze(c)
        x1 = np.zeros((4, 2), np.float32)
        x2 = np.ones((4, 2), np.float32)
        y = np.zeros((4, 1), np.float32)
        assert _data_fingerprint(x1, y) == _data_fingerprint(x1.copy(), y)
        assert _data_fingerprint(x1, y) != _data_fingerprint(x2, y)

    def test_freeze_snapshots_tuner_params(self):
        from eeyore_tpu.samplers.dispatch import _freeze
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        t = HMCDATuner(l=0.5)
        before = _freeze(t)
        t.d = 0.9  # mutate a scalar attribute -> fingerprint must change
        assert _freeze(t) != before


class TestHMCUnrollCap:
    def test_large_max_num_steps_is_ineligible(self):
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        kernel = HMC(xor_model(), step=0.05, num_steps=10,
                     tuner=HMCDATuner(l=0.5), max_num_steps=128)
        plan, reason = resolve_backend(kernel, XOR, 8192, 256, platform="tpu")
        assert plan is None and "64" in reason
        # at the cap the plan resolves and forwards the true value
        kernel = HMC(xor_model(), step=0.05, num_steps=10,
                     tuner=HMCDATuner(l=0.5), max_num_steps=64)
        plan, _ = resolve_backend(kernel, XOR, 8192, 256, platform="tpu")
        assert plan is not None and plan.kwargs["max_num_steps"] == 64


class TestFallbackIdentity:
    def test_auto_equals_scan_off_tpu(self):
        # on CPU backend="auto" must be EXACTLY the scanned path
        model = xor_model()
        kernel = MALA(model, step=0.01)
        theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, model.num_params))
        a = sample_chains(kernel, jax.random.PRNGKey(2), theta0s, XOR,
                          num_iters=50, return_arrays=True, backend="auto")
        b = sample_chains(kernel, jax.random.PRNGKey(2), theta0s, XOR,
                          num_iters=50, return_arrays=True, backend="scan")
        np.testing.assert_array_equal(np.asarray(a["sample"]),
                                      np.asarray(b["sample"]))


class TestParamGate:
    def test_large_models_stay_scanned(self):
        """Whole-loop residency is a small-state design: auto-dispatch must
        reject large-P models (measured boundary: P=12730 spills 202MB of
        register slots, benchmarks/WIDE_MODEL_RESULTS.json)."""
        wide = MLP(loss=loss_functions["multiclass_classification"],
                   hparams=mlp.Hyperparameters(dims=[64, 8, 2],
                                               activations=[mlp.sigmoid, None]))
        assert wide.num_params > 256
        x = jnp.zeros((16, 64))
        y = jnp.zeros((16, 2)).at[:, 0].set(1.0)
        plan, reason = resolve_backend(HMC(wide, step=0.01), (x, y),
                                       8192, 256, platform="tpu")
        assert plan is None and "MAX_DISPATCH_PARAMS" in reason


class TestTemperingDispatch:
    def test_even_odd_ladder_resolves(self):
        from eeyore_tpu.samplers import PowerPosteriorSampler
        from eeyore_tpu.samplers.dispatch import resolve_tempering

        pp = PowerPosteriorSampler(xor_model(), num_chains=8, sampler="MALA",
                                   sampler_kwargs={"step": 0.05},
                                   between_step=5, swap_scheme="even_odd")
        plan, reason = resolve_tempering(pp, XOR, 256, 64, platform="tpu")
        assert plan is not None, reason
        assert plan.backend == "dense"
        assert plan.maker.__name__ == "make_resident_tempering_dense"
        assert plan.chain_block % 8 == 0
        assert plan.kwargs["num_rungs"] == 8
        assert plan.kwargs["between_step"] == 5

    def test_categorical_and_cpu_stay_scanned(self):
        from eeyore_tpu.samplers import PowerPosteriorSampler
        from eeyore_tpu.samplers.dispatch import resolve_tempering

        cat = PowerPosteriorSampler(xor_model(), num_chains=8, sampler="MALA",
                                    swap_scheme="categorical")
        plan, reason = resolve_tempering(cat, XOR, 256, 64, platform="tpu")
        assert plan is None and "categorical" in reason
        eo = PowerPosteriorSampler(xor_model(), num_chains=8, sampler="MALA",
                                   swap_scheme="even_odd")
        plan, reason = resolve_tempering(eo, XOR, 256, 64, platform="cpu")
        assert plan is None and "TPU" in reason

    def test_default_scale_matches_inner_samplers(self):
        # advisor round 4: the kernel's fallback proposal scale must match
        # the scanned inner samplers' defaults (MALA step=0.1, MH scale=1.0)
        from eeyore_tpu.samplers import PowerPosteriorSampler
        from eeyore_tpu.samplers.dispatch import resolve_tempering

        mala = PowerPosteriorSampler(xor_model(), num_chains=8, sampler="MALA",
                                     swap_scheme="even_odd")
        plan, _ = resolve_tempering(mala, XOR, 256, 64, platform="tpu")
        assert plan is not None and plan.kwargs["step"] == 0.1
        mh = PowerPosteriorSampler(xor_model(), num_chains=8,
                                   sampler="MetropolisHastings",
                                   swap_scheme="even_odd")
        plan, _ = resolve_tempering(mh, XOR, 256, 64, platform="tpu")
        assert plan is not None and plan.kwargs["step"] == 1.0

    def test_run_auto_equals_scan_off_tpu(self):
        from eeyore_tpu.samplers import PowerPosteriorSampler

        pp = PowerPosteriorSampler(xor_model(), num_chains=4, sampler="MALA",
                                   sampler_kwargs={"step": 0.05},
                                   swap_scheme="even_odd")
        a = pp.run(jax.random.PRNGKey(0), 0.1 * jnp.ones(9), XOR, 60, 20)
        b = pp.run(jax.random.PRNGKey(0), 0.1 * jnp.ones(9), XOR, 60, 20,
                   backend="scan")
        np.testing.assert_array_equal(np.asarray(a.get_chain(3, key="sample")),
                                      np.asarray(b.get_chain(3, key="sample")))


class TestSMCDispatch:
    def test_bayesian_model_resolves(self):
        from eeyore_tpu.samplers import SMCSampler
        from eeyore_tpu.samplers.dispatch import resolve_smc

        x, y = XOR
        smc = SMCSampler(xor_model(), num_particles=4096, mutation="MALA")
        cb, reason = resolve_smc(smc, (x, y), platform="tpu")
        assert cb is not None and 4096 % cb == 0, reason
        # off-TPU: quiet fallback
        cb, reason = resolve_smc(smc, (x, y), platform="cpu")
        assert cb is None and "TPU" in reason

    def test_distribution_model_with_base_resolves(self):
        from eeyore_tpu.samplers import SMCSampler
        from eeyore_tpu.samplers.dispatch import resolve_smc

        dm = DistributionModel(lambda t, x, y: -0.5 * t @ t, num_params=2)
        smc = SMCSampler(dm, num_particles=2048, mutation="MH",
                         init_sampler=lambda k, n: jax.random.normal(k, (n, 2)),
                         base_log_pdf=lambda t: -0.5 * t @ t)
        cb, reason = resolve_smc(smc, (jnp.zeros((1, 0)), jnp.zeros((1, 0))),
                                 platform="tpu")
        assert cb is not None, reason

    def test_ineligible_cases(self):
        from eeyore_tpu.samplers import SMCSampler
        from eeyore_tpu.samplers.dispatch import resolve_smc

        x, y = XOR
        # particles not divisible by the smallest block
        smc = SMCSampler(xor_model(), num_particles=1000)
        cb, reason = resolve_smc(smc, (x, y), platform="tpu")
        assert cb is None and "divisible" in reason
        # explicit dense raises (SMC is resident-only)
        smc = SMCSampler(xor_model(), num_particles=4096)
        with pytest.raises(ValueError, match="resident"):
            resolve_smc(smc, (x, y), platform="tpu", backend="dense")

    def test_generic_vg_matches_scanned_math_on_cpu(self):
        # the generic per-lane vg (ops/resident_smc.make_generic_vg) must
        # reproduce the scanned SMC's potential/base split and grads —
        # CPU-checked outside any kernel (the kernel only lowers it)
        from eeyore_tpu.ops.resident_smc import make_generic_vg

        def base(t):
            return -0.5 * jnp.dot(t, t) / 9.0

        dm = DistributionModel(
            lambda t, x, y: -0.5 * jnp.dot(t - 1.0, t - 1.0), num_params=3)
        vg = make_generic_vg(dm, np.zeros((1, 0)), np.zeros((1, 0)), base,
                             with_grad=True)
        theta = jnp.asarray(np.random.RandomState(0).randn(3, 8), jnp.float32)
        ll, lp, gll, glp = vg(theta)
        assert ll.shape == (1, 8) and gll.shape == (3, 8)
        for j in range(8):
            t = theta[:, j]
            expect_ll = float(dm.log_target(t, None, None) - base(t))
            expect_lp = float(base(t))
            np.testing.assert_allclose(float(ll[0, j]), expect_ll, rtol=1e-5)
            np.testing.assert_allclose(float(lp[0, j]), expect_lp, rtol=1e-5)
            g_t = jax.grad(lambda v: dm.log_target(v, None, None) - base(v))(t)
            np.testing.assert_allclose(np.asarray(gll[:, j]), np.asarray(g_t),
                                       rtol=1e-4, atol=1e-5)


class TestNUTSDepthGate:
    def test_deep_budgets_stay_scanned(self):
        # the kernels unroll 2^depth - 1 leapfrogs: depth > MAX_KERNEL_DEPTH
        # compiles for tens of minutes (and has faulted the compile
        # service) — it must fall back to scan, not wedge the device
        from eeyore_tpu.samplers.dispatch import MAX_KERNEL_DEPTH

        kernel = NUTS(xor_model(), step=0.1, max_depth=7, fixed_budget=True)
        plan, reason = resolve_backend(kernel, XOR, 8192, 256, platform="tpu")
        assert plan is None and "MAX_KERNEL_DEPTH" in reason
        kernel = NUTS(xor_model(), step=0.1, max_depth=MAX_KERNEL_DEPTH,
                      fixed_budget=True)
        plan, _ = resolve_backend(kernel, XOR, 8192, 256, platform="tpu")
        assert plan is not None

    def test_auto_probe_caps_depth(self):
        from eeyore_tpu.samplers.dispatch import MAX_KERNEL_DEPTH

        kernel = NUTS(xor_model(), step=0.1, max_depth="auto")
        kernel.resolve_auto_budget(XOR, key=jax.random.PRNGKey(0),
                                   num_warmup=32, num_chains=2)
        assert kernel.max_depth <= MAX_KERNEL_DEPTH


class TestTemperingRecordKeys:
    def test_target_val_resolves_with_extras(self):
        from eeyore_tpu.samplers import PowerPosteriorSampler
        from eeyore_tpu.samplers.dispatch import resolve_tempering

        pp = PowerPosteriorSampler(xor_model(), num_chains=8, sampler="MALA",
                                   sampler_kwargs={"step": 0.05},
                                   swap_scheme="even_odd")
        plan, reason = resolve_tempering(
            pp, XOR, 256, 64, platform="tpu",
            record_keys=("sample", "target_val", "accepted"))
        assert plan is not None, reason
        assert plan.kwargs["record_extras"] is True
        # keys beyond the kernel contract fall back to the scanned ladder
        plan, reason = resolve_tempering(
            pp, XOR, 256, 64, platform="tpu",
            record_keys=("sample", "grad_val"))
        assert plan is None and "grad_val" in reason
