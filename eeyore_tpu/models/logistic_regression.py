"""Bayesian logistic regression: single linear layer + optional activation.

Reference: /root/reference/eeyore/models/logistic_regression.py:8-37.
Flat theta layout: row-major weight (output_size, input_size) then bias.
"""

import jax
import jax.numpy as jnp

from eeyore_tpu.models.mlp import sigmoid
from eeyore_tpu.models.model import BayesianModel
from eeyore_tpu.models.priors import IIDNormalPrior


class Hyperparameters:
    def __init__(self, input_size=1, output_size=1, bias=True, activation="default"):
        self.input_size = input_size
        self.output_size = output_size
        self.bias = bias
        self.activation = sigmoid if activation == "default" else activation


class LogisticRegression(BayesianModel):
    def __init__(self, loss, hparams=None, prior=None, temperature=None, dtype=None,
                 matmul_precision=jax.lax.Precision.HIGH):
        super().__init__(loss, prior=prior, temperature=temperature, dtype=dtype)
        self.matmul_precision = matmul_precision
        self.hp = hparams or Hyperparameters()
        self.num_params = self.hp.input_size * self.hp.output_size + (
            self.hp.output_size if self.hp.bias else 0
        )
        self.prior = prior or self.default_prior()

    def default_prior(self):
        return IIDNormalPrior.standard(self.num_params, dtype=self.dtype)

    def forward(self, theta, x):
        w_size = self.hp.input_size * self.hp.output_size
        w = theta[..., :w_size].reshape(theta.shape[:-1] + (self.hp.output_size, self.hp.input_size))
        # 3-pass-bf16 matmul: the f32 TPU default is one bf16 MXU pass,
        # which inflates gradient-based samplers' energy error (see MLP.forward)
        h = jnp.matmul(x, w.T, precision=self.matmul_precision)
        if self.hp.bias:
            h = h + theta[..., w_size:]
        if self.hp.activation is not None:
            h = self.hp.activation(h)
        return h
