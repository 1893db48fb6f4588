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
