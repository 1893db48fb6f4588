"""Pallas fused-kernel tests (interpreter mode on CPU): the hand-derived
forward+backward must match jax.value_and_grad of the model's log target to
f32 precision across architectures, losses, priors and temperatures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeyore_tpu.models import IIDNormalPrior, MLP, loss_functions, mlp
from eeyore_tpu.ops.fused_mlp import make_fused_log_target_vg
from eeyore_tpu.ops.fused_hmc import FusedHMC

RNG = np.random.default_rng(99)


def compare(model, x, y, n_chains=128, atol=1e-4):
    fn = make_fused_log_target_vg(model, x, y, chain_block=n_chains, interpret=True)
    thetas = RNG.normal(size=(n_chains, model.num_params)).astype(np.float32)
    vals, grads = fn(jnp.asarray(thetas))
    ref_v, ref_g = jax.vmap(
        lambda t: jax.value_and_grad(model.log_target)(t, jnp.asarray(x, jnp.float32),
                                                       jnp.asarray(y, jnp.float32))
    )(jnp.asarray(thetas))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=2e-5, atol=atol)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(ref_g), rtol=2e-5, atol=atol)


class TestFusedValueGrad:
    def test_bce_mlp221_xor(self):
        x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
        y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
        compare(model, x, y)

    def test_bce_deep_no_bias(self):
        x = RNG.normal(size=(10, 3)).astype(np.float32)
        y = RNG.integers(0, 2, size=(10, 1)).astype(np.float32)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[3, 4, 2, 1],
                                                bias=[False, True, False]),
                    dtype=jnp.float32)
        compare(model, x, y)

    def test_ce_mlp433(self):
        x = RNG.normal(size=(150, 4)).astype(np.float32)
        y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 150)]
        model = MLP(loss=loss_functions["multiclass_classification"],
                    hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                                activations=[mlp.sigmoid, None]),
                    dtype=jnp.float32)
        compare(model, x, y, atol=3e-4)

    def test_nonstandard_prior_and_temperature(self):
        x = np.array([[0., 0.], [1., 1.]], dtype=np.float32)
        y = np.array([[0.], [1.]], dtype=np.float32)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
        model.prior = IIDNormalPrior(np.full(model.num_params, 0.5),
                                     np.full(model.num_params, 2.0))
        model.temperature = 0.3
        compare(model, x, y)

    def test_rejects_unsupported(self):
        model = MLP(loss=lambda p, y: jnp.sum(p),
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
        with pytest.raises(ValueError):
            make_fused_log_target_vg(model, np.zeros((2, 2)), np.zeros((2, 1)))


class TestFusedHMC:
    def test_posterior_matches_generic_hmc(self):
        """Fused-path HMC must sample the same posterior as the generic
        kernel (statistical agreement on posterior mean)."""
        x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
        y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
        key = jax.random.PRNGKey(0)
        C = 64
        theta0s = 0.1 * jax.random.normal(key, (C, model.num_params), dtype=jnp.float32)

        fused = FusedHMC(model, x, y, step=0.1, num_steps=5, chain_block=C, interpret=True)
        state, rec = fused.run(key, theta0s, 600, 200)
        acc = np.asarray(rec["accepted"]).mean()
        assert 0.5 < acc <= 1.0
        fused_mean = np.asarray(rec["sample"]).reshape(-1, model.num_params).mean(0)

        from eeyore_tpu.samplers import HMC, sample_chains

        kern = HMC(model, step=0.1, num_steps=5)
        chains = sample_chains(kern, key, theta0s, (x, y), 600, 200)
        generic_mean = chains.get_samples().reshape(-1, model.num_params).mean(0)
        np.testing.assert_allclose(fused_mean, generic_mean, atol=0.35)

    def test_population_tuner(self):
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
        y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
        key = jax.random.PRNGKey(1)
        C = 32
        theta0s = 0.1 * jax.random.normal(key, (C, model.num_params), dtype=jnp.float32)
        fused = FusedHMC(model, x, y, step=0.2, tuner=HMCDATuner(l=0.6, e0=0.2),
                         chain_block=C, interpret=True)
        state, rec = fused.run(key, theta0s, 500, 300)
        acc = np.asarray(rec["accepted"]).mean()
        assert abs(acc - 0.65) < 0.15  # population DA pulls toward d=0.65


class TestDenseKernelContracts:
    """CPU-checkable contracts of the dense resident kernels (the kernels
    themselves need TPU hardware; statistics validated on-device in
    benchmarks/validate_dense*.py)."""

    def _model_xy(self):
        import numpy as np

        from eeyore_tpu.models import MLP, loss_functions, mlp

        x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
        y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        return model, x, y

    def test_chain_block_must_be_tile_multiple(self):
        import pytest

        from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense

        model, x, y = self._model_xy()
        with pytest.raises(ValueError, match="1024"):
            make_resident_hmc_dense(model, x, y, step=0.05, num_steps=10,
                                    num_iters=16, chain_block=512)

    def test_chains_must_divide_blocks(self):
        import jax.numpy as jnp
        import pytest

        from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense

        model, x, y = self._model_xy()
        fn = make_resident_hmc_dense(model, x, y, step=0.05, num_steps=10,
                                     num_iters=16, chain_block=1024)
        with pytest.raises(ValueError, match="multiple"):
            fn(0, jnp.zeros((1536, model.num_params)))

    def test_hmc_dense_tuner_modes(self):
        import pytest

        from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        model, x, y = self._model_xy()
        make_resident_hmc_dense(model, x, y, step=0.5, num_steps=10,
                                num_iters=64, tuner=HMCDATuner(l=0.5))
        make_resident_hmc_dense(model, x, y, step=0.5, num_steps=10,
                                num_iters=64, tuner=HMCDATuner(d=0.65),
                                tuner_mode="per_chain")
        # per-chain WITH a trajectory length: per-lane l-rule, block-max loop
        make_resident_hmc_dense(model, x, y, step=0.5, num_steps=10,
                                num_iters=64, tuner=HMCDATuner(l=0.5, d=0.65),
                                tuner_mode="per_chain")
        with pytest.raises(ValueError, match="tuner_mode"):
            make_resident_hmc_dense(model, x, y, step=0.5, num_steps=10,
                                    num_iters=64, tuner=HMCDATuner(),
                                    tuner_mode="per_lane")

    def test_walk_and_gibbs_dense_builders(self):
        """Tuned walk kernels and the incremental Gibbs kernel must build
        for any supported architecture without tracing device code."""
        from eeyore_tpu.ops.resident_walk_dense import (
            make_resident_gibbs_dense,
            make_resident_mala_dense,
            make_resident_mh_dense,
        )
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        model, x, y = self._model_xy()
        make_resident_mh_dense(model, x, y, scale=0.5, num_iters=64,
                               tuner=HMCDATuner(d=0.234))
        make_resident_mala_dense(model, x, y, step=0.1, num_iters=64,
                                 tuner=HMCDATuner(d=0.574))
        make_resident_gibbs_dense(model, x, y, scales=0.5, num_iters=64)

    def test_tempering_dense_validation(self):
        import pytest

        from eeyore_tpu.ops.resident_tempering_dense import (
            make_resident_tempering_dense,
        )

        model, x, y = self._model_xy()
        with pytest.raises(ValueError, match="sampler"):
            make_resident_tempering_dense(model, x, y, num_rungs=8,
                                          sampler="HMC", chain_block=8192)
        model.temperature = 0.5
        with pytest.raises(ValueError, match="untempered"):
            make_resident_tempering_dense(model, x, y, num_rungs=8,
                                          chain_block=8192)


class TestResidentTemperingLayout:
    """CPU-testable pieces of the resident tempering kernel: the ladder-major
    lane constants and the even/odd roll-based swap shuffle (simulated with
    numpy rolls — the same circular-shift semantics as pltpu.roll)."""

    def test_ladder_lane_constants(self):
        from eeyore_tpu.ops.resident_tempering import ladder_lane_constants
        from eeyore_tpu.samplers.power_posterior import default_temperatures

        L, cb = 4, 16
        temps_lad = default_temperatures(L)
        temps, temps_right, m_even, m_odd = ladder_lane_constants(L, cb, temps_lad)
        assert temps.shape == (1, cb)
        # ladder-major tiling, coldest (temperature 1) last in each ladder
        np.testing.assert_allclose(temps[0, :L], np.asarray(temps_lad, np.float32))
        np.testing.assert_allclose(temps[0], np.tile(temps[0, :L], cb // L))
        assert temps[0, L - 1] == 1.0
        # lower-pair masks: even rungs 0,2 / odd rung 1; rung L-1 never lower
        np.testing.assert_array_equal(m_even[0, :L], [1, 0, 1, 0])
        np.testing.assert_array_equal(m_odd[0, :L], [0, 1, 0, 0])
        # temps_right[c] = temps[c+1] wherever the lane can be a lower member
        lower = (m_even[0] + m_odd[0]) > 0
        np.testing.assert_allclose(temps_right[0, :-1][lower[:-1]],
                                   temps[0, 1:][lower[:-1]])

    def test_ladder_lane_constants_validation(self):
        from eeyore_tpu.ops.resident_tempering import ladder_lane_constants

        with pytest.raises(ValueError, match="multiple"):
            ladder_lane_constants(3, 16, [0.1, 0.5, 1.0])
        with pytest.raises(ValueError, match="temperatures"):
            ladder_lane_constants(4, 16, [0.1, 0.5, 1.0])

    def test_swap_shuffle_numpy_simulation(self):
        """With acceptance forced everywhere, the roll+mask lattice must swap
        exactly the (even, even+1) pairs within each ladder and touch nothing
        across ladder boundaries."""
        from eeyore_tpu.ops.resident_tempering import ladder_lane_constants

        L, cb, P = 4, 8, 3
        _, _, m_even, m_odd = ladder_lane_constants(L, cb, [0.1, 0.3, 0.6, 1.0])
        rng = np.random.default_rng(0)
        theta = rng.normal(size=(P, cb))

        for m, pairs in ((m_even, [(0, 1), (2, 3), (4, 5), (6, 7)]),
                         (m_odd, [(1, 2), (5, 6)])):
            acc_lower = m.copy()  # accept every eligible pair
            acc_upper = np.roll(acc_lower, 1, axis=1)
            theta_r = np.roll(theta, -1, axis=1)
            theta_l = np.roll(theta, 1, axis=1)
            out = np.where(acc_lower > 0.5, theta_r,
                           np.where(acc_upper > 0.5, theta_l, theta))
            expected = theta.copy()
            for i, j in pairs:
                expected[:, [i, j]] = expected[:, [j, i]]
            np.testing.assert_array_equal(out, expected)

    def test_tempering_maker_validation(self):
        from eeyore_tpu.ops.resident_tempering import make_resident_tempering

        x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
        y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
        with pytest.raises(ValueError, match="sampler"):
            make_resident_tempering(model, x, y, num_rungs=4, sampler="HMC")
        tempered = MLP(loss=loss_functions["binary_classification"],
                       hparams=mlp.Hyperparameters(dims=[2, 2, 1]),
                       temperature=0.5, dtype=jnp.float32)
        with pytest.raises(ValueError, match="untempered"):
            make_resident_tempering(tempered, x, y, num_rungs=4)


class TestSincos2Pi:
    """Polynomial sincos for the kernel PRNG's Box-Muller angles: quadrant
    reduction is exact for uniform inputs; the Taylor tails must sit at f32
    round-off against the transcendental reference."""

    def test_accuracy_against_transcendental(self):
        import jax.numpy as jnp
        import numpy as np

        from eeyore_tpu.ops.kernel_prng import sincos_2pi

        u = np.linspace(2**-23, 1.0, 200001).astype(np.float32)
        c, s = sincos_2pi(jnp.asarray(u))
        ref_c = np.cos(2 * np.pi * u.astype(np.float64))
        ref_s = np.sin(2 * np.pi * u.astype(np.float64))
        assert np.max(np.abs(np.asarray(c, np.float64) - ref_c)) < 5e-7
        assert np.max(np.abs(np.asarray(s, np.float64) - ref_s)) < 5e-7

    def test_quadrant_boundaries(self):
        import jax.numpy as jnp
        import numpy as np

        from eeyore_tpu.ops.kernel_prng import sincos_2pi

        u = jnp.asarray([0.25, 0.5, 0.75, 1.0], jnp.float32)
        c, s = sincos_2pi(u)
        np.testing.assert_allclose(np.asarray(c), [0.0, -1.0, 0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(s), [1.0, 0.0, -1.0, 0.0], atol=1e-6)

    def test_unit_circle(self):
        import jax.numpy as jnp
        import numpy as np

        from eeyore_tpu.ops.kernel_prng import sincos_2pi

        rng = np.random.default_rng(0)
        u = rng.random(4096).astype(np.float32)
        u[u == 0.0] = 0.5
        c, s = sincos_2pi(jnp.asarray(u))
        r2 = np.asarray(c, np.float64) ** 2 + np.asarray(s, np.float64) ** 2
        assert np.max(np.abs(r2 - 1.0)) < 1e-6


class TestResidentNutsBuilders:
    """CPU-side contract checks for the fixed-budget NUTS kernel makers
    (the kernels themselves are TPU-only; device validation:
    benchmarks/validate_dense_nuts.py)."""

    def _model_xy(self):
        from eeyore_tpu.models import MLP, loss_functions, mlp

        model = MLP(loss=loss_functions["binary_classification"],
                    hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
        x = np.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], np.float32)
        y = np.asarray([[0.], [1.], [1.], [0.]], np.float32)
        return model, x, y

    def test_dense_maker_validates(self):
        from eeyore_tpu.ops.resident_nuts_dense import make_resident_nuts_dense
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        model, x, y = self._model_xy()
        with pytest.raises(ValueError, match="max_depth"):
            make_resident_nuts_dense(model, x, y, step=0.1, max_depth=0,
                                     num_iters=8)
        with pytest.raises(ValueError, match="chain_block"):
            make_resident_nuts_dense(model, x, y, step=0.1, max_depth=3,
                                     num_iters=8, chain_block=512)
        with pytest.raises(ValueError, match="trajectory"):
            make_resident_nuts_dense(model, x, y, step=0.1, max_depth=3,
                                     num_iters=8, tuner=HMCDATuner(l=0.5))
        # chain-count check happens at call time, before any pallas work
        fn = make_resident_nuts_dense(model, x, y, step=0.1, max_depth=3,
                                      num_iters=8, chain_block=1024)
        with pytest.raises(ValueError, match="chains"):
            fn(0, jnp.zeros((512, model.num_params)))

    def test_sublane_maker_validates(self):
        from eeyore_tpu.ops.resident_nuts import make_resident_nuts
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        model, x, y = self._model_xy()
        with pytest.raises(ValueError, match="max_depth"):
            make_resident_nuts(model, x, y, step=0.1, max_depth=0, num_iters=8)
        with pytest.raises(ValueError, match="trajectory"):
            make_resident_nuts(model, x, y, step=0.1, max_depth=3,
                               num_iters=8, tuner=HMCDATuner(l=0.5))
        fn = make_resident_nuts(model, x, y, step=0.1, max_depth=3,
                                num_iters=8, chain_block=256)
        with pytest.raises(ValueError, match="chains"):
            fn(0, jnp.zeros((100, model.num_params)))
