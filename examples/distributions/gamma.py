"""MALA on a Gamma(k, theta) target, normalized and unnormalized — the
sampler only needs the log-density up to a constant.

Mirrors /root/reference/examples/samplers/distributions/gamma/
(mala_normalized_target.py, mala_unnormalized_target.py).
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import math

import jax
import jax.numpy as jnp

from eeyore_tpu.models import DistributionModel
from eeyore_tpu.samplers import MALA, sample_chain


def main():
    k, scale = 4.0, 1.5  # mean = k*scale = 6, var = k*scale^2 = 9

    def log_pdf_unnormalized(theta, x, y):
        t = theta[0]
        return (k - 1.0) * jnp.log(jnp.abs(t)) - jnp.abs(t) / scale

    log_norm = k * math.log(scale) + math.lgamma(k)

    def log_pdf_normalized(theta, x, y):
        return log_pdf_unnormalized(theta, x, y) - log_norm

    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    key = jax.random.PRNGKey(0)

    for name, log_pdf in [("normalized", log_pdf_normalized),
                          ("unnormalized", log_pdf_unnormalized)]:
        model = DistributionModel(log_pdf, num_params=1)
        chain = sample_chain(MALA(model, step=0.5), key, jnp.asarray([6.0]),
                             data, 11000, 1000)
        s = chain.get_samples()[:, 0]
        print(f"{name:13s} acc={chain.acceptance_rate():.3f} "
              f"mean={s.mean():.2f} (true {k*scale}) var={s.var():.2f} (true {k*scale**2})")


if __name__ == "__main__":
    main()
