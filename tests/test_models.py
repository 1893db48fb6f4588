"""Equivalence-oracle tests for the model layer (the reference's test
strategy: log-lik / log-target / gradient checked against independent
re-derivations in float64 — cf. /root/reference/tests/test_binary_classif_*).

Oracles here: hand-rolled numpy forwards over explicit weight slices, torch
nn-module forwards with identically-laid-out parameters, and finite
differences for gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from eeyore_tpu.models import (
    IIDNormalPrior,
    LogisticRegression,
    MLP,
    DistributionModel,
    loss_functions,
    logistic_regression,
    mlp,
)

RNG = np.random.default_rng(20260817)


def np_sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def manual_mlp_forward(theta, x, dims, bias, last_linear=False):
    """Independent numpy forward with explicit slicing of the flat theta."""
    h = np.asarray(x, dtype=np.float64)
    i = 0
    for l in range(len(dims) - 1):
        d_in, d_out = dims[l], dims[l + 1]
        w = theta[i:i + d_in * d_out].reshape(d_out, d_in)
        i += d_in * d_out
        b = 0.0
        if bias[l]:
            b = theta[i:i + d_out]
            i += d_out
        h = h @ w.T + b
        if not (last_linear and l == len(dims) - 2):
            h = np_sigmoid(h)
    return h


def torch_mlp_forward(theta, x, dims, bias, last_linear=False):
    """Torch oracle: nn.Linear stack with theta scattered in the reference's
    parameter order (per-layer weight row-major, then bias)."""
    layers = []
    for l in range(len(dims) - 1):
        layers.append(torch.nn.Linear(dims[l], dims[l + 1], bias=bias[l]).double())
    params = [p for layer in layers for p in layer.parameters()]
    i = 0
    with torch.no_grad():
        for p in params:
            j = p.numel()
            p.copy_(torch.tensor(theta[i:i + j]).view(p.shape))
            i += j
    h = torch.tensor(np.asarray(x), dtype=torch.float64)
    for l, layer in enumerate(layers):
        h = layer(h)
        if not (last_linear and l == len(layers) - 1):
            h = torch.sigmoid(h)
    return h.detach().numpy()


def xor_data():
    x = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    y = np.array([[0.0], [1.0], [1.0], [0.0]])
    return x, y


class TestBinaryMLP221:
    dims = [2, 2, 1]
    bias = [True, True]

    def make(self):
        hp = mlp.Hyperparameters(dims=self.dims, bias=self.bias)
        return MLP(loss=loss_functions["binary_classification"], hparams=hp)

    def test_log_lik_vs_manual(self):
        model = self.make()
        x, y = xor_data()
        theta = RNG.normal(size=model.num_params)
        preds = manual_mlp_forward(theta, x, self.dims, self.bias)
        expected = np.sum(np.log(preds) * y + np.log(1 - preds) * (1 - y))
        got = model.log_lik(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(got), expected, rtol=1e-12)

    def test_forward_vs_torch(self):
        model = self.make()
        x, _ = xor_data()
        theta = RNG.normal(size=model.num_params)
        got = np.asarray(model.forward(jnp.asarray(theta), jnp.asarray(x)))
        expected = torch_mlp_forward(theta, x, self.dims, self.bias)
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_log_target_decomposition(self):
        model = self.make()
        x, y = xor_data()
        theta = RNG.normal(size=model.num_params)
        t = jnp.asarray(theta)
        lt = model.log_target(t, jnp.asarray(x), jnp.asarray(y))
        ll = model.log_lik(t, jnp.asarray(x), jnp.asarray(y))
        lp = model.log_prior(t)
        np.testing.assert_allclose(float(lt), float(ll) + float(lp), rtol=1e-12)
        # standard-normal prior closed form
        expected_lp = np.sum(-0.5 * theta**2 - 0.5 * np.log(2 * np.pi))
        np.testing.assert_allclose(float(lp), expected_lp, rtol=1e-12)

    def test_temperature_scales_both_terms(self):
        """Temperature multiplies BOTH log-lik and log-prior
        (reference bayesian_model.py:30-50)."""
        model = self.make()
        x, y = xor_data()
        theta = jnp.asarray(RNG.normal(size=model.num_params))
        cold = model.log_target(theta, jnp.asarray(x), jnp.asarray(y))
        tempered = model.with_temperature(0.25)
        warm = tempered.log_target(theta, jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(warm), 0.25 * float(cold), rtol=1e-12)

    def test_grad_vs_finite_differences(self):
        model = self.make()
        x, y = xor_data()
        theta = RNG.normal(size=model.num_params)
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        val, grad = model.upto_grad_log_target(jnp.asarray(theta), xj, yj)
        np.testing.assert_allclose(float(val), float(model.log_target(jnp.asarray(theta), xj, yj)))
        eps = 1e-6
        for i in range(model.num_params):
            tp, tm = theta.copy(), theta.copy()
            tp[i] += eps
            tm[i] -= eps
            fd = (float(model.log_target(jnp.asarray(tp), xj, yj))
                  - float(model.log_target(jnp.asarray(tm), xj, yj))) / (2 * eps)
            np.testing.assert_allclose(float(grad[i]), fd, rtol=1e-5, atol=1e-7)


class TestDeepBinaryMLP2321:
    dims = [2, 3, 2, 1]
    bias = [True, True, True]

    def test_log_lik_vs_manual(self):
        hp = mlp.Hyperparameters(dims=self.dims, bias=self.bias)
        model = MLP(loss=loss_functions["binary_classification"], hparams=hp)
        x, y = xor_data()
        theta = RNG.normal(size=model.num_params)
        preds = manual_mlp_forward(theta, x, self.dims, self.bias)
        expected = np.sum(np.log(preds) * y + np.log(1 - preds) * (1 - y))
        got = model.log_lik(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(got), expected, rtol=1e-12)


class TestMulticlassMLP433:
    dims = [4, 3, 3]
    bias = [True, True]

    def make(self):
        hp = mlp.Hyperparameters(
            dims=self.dims, bias=self.bias,
            activations=[mlp.sigmoid, None],  # logits out, like the iris example
        )
        return MLP(loss=loss_functions["multiclass_classification"], hparams=hp)

    def test_log_lik_vs_manual(self):
        model = self.make()
        x = RNG.normal(size=(10, 4))
        labels = RNG.integers(0, 3, size=10)
        y = np.eye(3)[labels]
        theta = RNG.normal(size=model.num_params)
        logits = manual_mlp_forward(theta, x, self.dims, self.bias, last_linear=True)
        lse = np.log(np.sum(np.exp(logits), axis=1))
        expected = -np.sum(lse - logits[np.arange(10), labels])
        got = model.log_lik(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(got), expected, rtol=1e-12)

    def test_log_lik_vs_torch_ce(self):
        model = self.make()
        x = RNG.normal(size=(10, 4))
        labels = RNG.integers(0, 3, size=10)
        y = np.eye(3)[labels]
        theta = RNG.normal(size=model.num_params)
        logits = torch_mlp_forward(theta, x, self.dims, self.bias, last_linear=True)
        expected = -torch.nn.CrossEntropyLoss(reduction="sum")(
            torch.tensor(logits), torch.tensor(labels)
        ).item()
        got = model.log_lik(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(got), expected, rtol=1e-12)


class TestMulticlassMLP4323:
    def test_log_lik_vs_manual(self):
        dims, bias = [4, 3, 2, 3], [True, True, True]
        hp = mlp.Hyperparameters(dims=dims, bias=bias,
                                 activations=[mlp.sigmoid, mlp.sigmoid, None])
        model = MLP(loss=loss_functions["multiclass_classification"], hparams=hp)
        x = RNG.normal(size=(7, 4))
        labels = RNG.integers(0, 3, size=7)
        y = np.eye(3)[labels]
        theta = RNG.normal(size=model.num_params)
        logits = manual_mlp_forward(theta, x, dims, bias, last_linear=True)
        lse = np.log(np.sum(np.exp(logits), axis=1))
        expected = -np.sum(lse - logits[np.arange(7), labels])
        got = model.log_lik(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(got), expected, rtol=1e-12)


class TestLogisticRegression:
    def test_forward_and_log_lik(self):
        hp = logistic_regression.Hyperparameters(input_size=3, output_size=1)
        model = LogisticRegression(loss=loss_functions["binary_classification"], hparams=hp)
        assert model.num_params == 4
        x = RNG.normal(size=(6, 3))
        y = RNG.integers(0, 2, size=(6, 1)).astype(float)
        theta = RNG.normal(size=4)
        preds = np_sigmoid(x @ theta[:3] + theta[3])[:, None]
        expected = np.sum(np.log(preds) * y + np.log(1 - preds) * (1 - y))
        got = model.log_lik(jnp.asarray(theta), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(got), expected, rtol=1e-12)


class TestDistributionModel:
    def test_log_target_and_temperature(self):
        def log_pdf(theta, x, y):
            return -0.5 * jnp.sum(theta**2)

        model = DistributionModel(log_pdf, num_params=3, temperature=0.5)
        theta = jnp.asarray([1.0, 2.0, 3.0])
        got = model.log_target(theta, None, None)
        np.testing.assert_allclose(float(got), 0.5 * (-0.5 * 14.0), rtol=1e-12)

    def test_grad(self):
        model = DistributionModel(lambda t, x, y: -0.5 * jnp.sum(t**2), num_params=3)
        theta = jnp.asarray([1.0, -2.0, 0.5])
        val, grad = model.upto_grad_log_target(theta, None, None)
        np.testing.assert_allclose(np.asarray(grad), -np.asarray(theta), rtol=1e-12)


class TestPackUnpack:
    def test_roundtrip(self):
        hp = mlp.Hyperparameters(dims=[3, 4, 2], bias=[True, False])
        model = MLP(loss=loss_functions["binary_classification"], hparams=hp)
        theta = jnp.asarray(RNG.normal(size=model.num_params))
        np.testing.assert_array_equal(np.asarray(model.pack(model.unpack(theta))), np.asarray(theta))


class TestPrior:
    def test_matches_torch_normal(self):
        prior = IIDNormalPrior(np.zeros(5), np.full(5, 2.0))
        theta = RNG.normal(size=5)
        expected = torch.distributions.Normal(
            torch.zeros(5, dtype=torch.float64), torch.full((5,), 2.0, dtype=torch.float64)
        ).log_prob(torch.tensor(theta)).numpy()
        np.testing.assert_allclose(np.asarray(prior.log_prob(jnp.asarray(theta))), expected, rtol=1e-12)

    def test_sample_moments(self):
        prior = IIDNormalPrior.isotropic(1000, 3.0)
        s = prior.sample(jax.random.PRNGKey(0))
        assert abs(float(jnp.std(s)) - 3.0) < 0.3


class TestPredictivePosterior:
    def test_nan_dropping(self):
        hp = mlp.Hyperparameters(dims=[2, 2, 1])
        model = MLP(loss=loss_functions["binary_classification"], hparams=hp)
        x, y = xor_data()
        thetas = jnp.asarray(RNG.normal(size=(20, model.num_params)))
        integral, dropped = model.predictive_posterior(thetas, jnp.asarray(x[:1]), jnp.asarray(y[:1]))
        assert dropped == 0
        assert 0.0 <= float(integral) <= 1.0
        # poison one sample with NaN -> exactly one dropped
        bad = thetas.at[3, 0].set(jnp.nan)
        integral2, dropped2 = model.predictive_posterior(bad, jnp.asarray(x[:1]), jnp.asarray(y[:1]))
        assert dropped2 == 1
        assert not np.isnan(float(integral2))


def test_bce_saturated_probabilities_no_nan():
    """f32 sigmoids saturate to exactly 0/1 for |z| > ~17; the BCE loss must
    follow the 0*log(0) = 0 convention there (finite loss + finite grad for
    correctly-classified saturated points; -inf only for a genuinely
    impossible wrong-side saturation). Poisoned the banknotes-LR SMC
    potentials under prior draws before the round-4 fix."""
    from eeyore_tpu.models.losses import binary_cross_entropy

    f = lambda x: binary_cross_entropy(x, jnp.asarray([1.0, 0.0]),
                                       reduction="sum")
    x_correct = jnp.asarray([1.0, 0.0])
    assert float(f(x_correct)) == 0.0
    assert np.all(np.isfinite(np.asarray(jax.grad(f)(x_correct))))
    x_wrong = jnp.asarray([0.0, 1.0])
    assert np.isinf(float(f(x_wrong)))
    # interior values keep the reference formula exactly
    xi = jnp.asarray([0.3, 0.8])
    yi = jnp.asarray([1.0, 0.0])
    naive = float(-(jnp.log(xi) * yi + jnp.log1p(-xi) * (1 - yi)).sum())
    assert abs(float(binary_cross_entropy(xi, yi, "sum")) - naive) < 1e-12
