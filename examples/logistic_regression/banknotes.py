"""Bayesian logistic regression on the Swiss banknotes dataset with MH and
RAM, plus posterior-predictive accuracy.

Mirrors /root/reference/examples/samplers/logistic_regression/banknotes/
(metropolis_hastings.py, ram.py).
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.datasets import XYDataset
from eeyore_tpu.models import LogisticRegression, loss_functions, logistic_regression
from eeyore_tpu.samplers import MetropolisHastings, RAM, sample_chain


def main():
    ds = XYDataset.from_eeyore("banknotes")
    # standardize features for a well-conditioned posterior
    x = (ds.x - ds.x.mean(0)) / ds.x.std(0)
    xj, yj = jnp.asarray(x), jnp.asarray(ds.y)

    model = LogisticRegression(
        loss=loss_functions["binary_classification"],
        hparams=logistic_regression.Hyperparameters(input_size=6, output_size=1))
    key = jax.random.PRNGKey(0)
    theta0 = jnp.zeros(model.num_params)

    for name, kern in [("MH", MetropolisHastings(model, scale=0.1)),
                       ("RAM", RAM(model, cov0=0.01 * np.eye(model.num_params)))]:
        chain = sample_chain(kern, key, theta0, (xj, yj), 11000, 1000)
        mean_theta = jnp.asarray(chain.mean())
        preds = model.forward(mean_theta, xj)
        acc = float(jnp.mean((preds > 0.5) == (yj > 0.5)))
        print(f"{name:4s} acceptance={chain.acceptance_rate():.3f} "
              f"multi_ess={chain.multi_ess():.0f} "
              f"posterior-mean classification accuracy={acc:.3f}")


if __name__ == "__main__":
    main()
