"""Sampling a correlated bivariate normal with the whole sampler zoo, and
validating each chain against the exact sampler with moments + MMD.

Mirrors /root/reference/examples/samplers/distributions/bivariate_normal/
(metropolis_hastings.py, mala.py, hmc.py, hmc_with_dual_averaging.py, am.py,
ram.py, power_posteriors.py) in one TPU-idiomatic script.

Run: python examples/distributions/bivariate_normal.py
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.kernels import IsoSEKernel
from eeyore_tpu.models import DistributionModel
from eeyore_tpu.samplers import (
    AM, HMC, MALA, MetropolisHastings, NUTS, PowerPosteriorSampler, RAM,
    sample_chain,
)
from eeyore_tpu.stats import mmd
from eeyore_tpu.tuners.dual_averaging import HMCDATuner


def main():
    cov = np.array([[1.0, 0.7], [0.7, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    model = DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    key = jax.random.PRNGKey(0)
    theta0 = jnp.asarray([2.0, -2.0])

    # exact samples for the MMD discrepancy check
    exact = jax.random.multivariate_normal(
        jax.random.PRNGKey(99), jnp.zeros(2), jnp.asarray(cov), (500,))

    samplers = {
        "MH": MetropolisHastings(model, scale=0.8),
        "MALA": MALA(model, step=0.5),
        "HMC": HMC(model, step=0.3, num_steps=10),
        "HMC+DA": HMC(model, tuner=HMCDATuner(l=1.5)),
        "AM": AM(model),
        "RAM": RAM(model),
        "NUTS": NUTS(model, step=0.4, max_depth=8),
    }
    for name, kern in samplers.items():
        chain = sample_chain(kern, key, theta0, data, 11000, 1000)
        s = chain.get_samples()
        d = float(mmd(jnp.asarray(s[::20]), exact, IsoSEKernel()))
        print(f"{name:7s} acc={chain.acceptance_rate():.3f} "
              f"mean={s.mean(0).round(3)} "
              f"mc_se={chain.mc_se().round(3)} "
              f"multi_ess={chain.multi_ess():.0f} mmd={d:.3f}")

    pp = PowerPosteriorSampler(model, num_chains=5, sampler="MALA",
                               sampler_kwargs={"step": 0.5}, between_step=10)
    chains = pp.run(key, theta0, data, 11000, 1000)
    cold = chains.get_chain(pp.default_indicator())
    print(f"PP      cold mean={cold.mean(0).round(3)} "
          f"cov=\n{np.cov(cold, rowvar=False).round(3)}")


if __name__ == "__main__":
    main()
