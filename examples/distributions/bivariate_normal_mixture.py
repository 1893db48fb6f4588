"""Sampling a two-component bivariate normal mixture — the multimodal target
where plain MH/MALA get stuck and AM (with the softabs PD-transform) and
tempering shine.

Mirrors /root/reference/examples/samplers/distributions/bivariate_normal_mixture/
(am.py uses transform=softabs there; power-posterior added for the multimodal
comparison).
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import functools

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import DistributionModel
from eeyore_tpu.samplers import AM, HMC, MetropolisHastings, PowerPosteriorSampler, sample_chain
from eeyore_tpu.stats import softabs


def make_model(mu=2.0):
    mu1 = jnp.asarray([mu, mu])
    mu2 = jnp.asarray([-mu, -mu])

    def log_pdf(theta, x, y):
        l1 = -0.5 * jnp.sum((theta - mu1) ** 2)
        l2 = -0.5 * jnp.sum((theta - mu2) ** 2)
        return jnp.logaddexp(l1, l2) - jnp.log(2.0)

    return DistributionModel(log_pdf, num_params=2)


def main():
    model = make_model()
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    key = jax.random.PRNGKey(0)
    theta0 = jnp.asarray([2.0, 2.0])

    samplers = {
        "MH": MetropolisHastings(model, scale=1.0),
        "HMC": HMC(model, step=0.5, num_steps=10),
        "AM+softabs": AM(model, transform=functools.partial(softabs, a=1000.0)),
    }
    for name, kern in samplers.items():
        chain = sample_chain(kern, key, theta0, data, 11000, 1000)
        s = chain.get_samples()
        frac_pos = float(np.mean(s[:, 0] > 0))
        print(f"{name:11s} acc={chain.acceptance_rate():.3f} "
              f"mean={s.mean(0).round(2)} mode-balance={frac_pos:.2f}")

    pp = PowerPosteriorSampler(model, num_chains=6, sampler="MALA",
                               sampler_kwargs={"step": 0.5}, between_step=5,
                               swap_scheme="even_odd")
    chains = pp.run(key, theta0, data, 11000, 1000)
    cold = chains.get_chain(pp.default_indicator())
    frac_pos = float(np.mean(cold[:, 0] > 0))
    print(f"{'PP':11s} cold mean={cold.mean(0).round(2)} mode-balance={frac_pos:.2f} "
          "(tempering crosses between modes)")


if __name__ == "__main__":
    main()
