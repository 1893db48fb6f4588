"""Multi-chip demo: chain-sharded HMC, a ppermute-swapped tempering ladder,
and sharded SMC on a device mesh.

Run on CPU with a virtual mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/parallel/multichip.py
or on a real TPU slice (the mesh picks up all local devices).
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.parallel import (
    chain_mesh, run_power_posterior_sharded, run_smc_sharded, sample_chains_sharded,
)
from eeyore_tpu.samplers import HMC, PowerPosteriorSampler, SMCSampler


def main():
    n_dev = len(jax.devices())
    print(f"{n_dev} devices: {jax.devices()}")
    mesh = chain_mesh(axis_name="chains")

    x = jnp.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=jnp.float32)
    y = jnp.asarray([[0.], [1.], [1.], [0.]], dtype=jnp.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    # 1. chain-sharded HMC
    C = 64 * n_dev
    theta0s = 0.1 * jax.random.normal(key, (C, model.num_params), dtype=jnp.float32)
    recorded, _ = sample_chains_sharded(HMC(model, step=0.05, num_steps=10),
                                        key, theta0s, (x, y), 500, 100, mesh=mesh)
    print("sharded chains:", recorded["sample"].shape,
          "acceptance:", float(np.asarray(recorded["accepted"]).mean()))

    # 2. sharded tempering ladder (2 rungs per device, ppermute swaps)
    pp = PowerPosteriorSampler(model, num_chains=2 * n_dev, sampler="MALA",
                               sampler_kwargs={"step": 0.01}, between_step=5,
                               swap_scheme="even_odd")
    rec = run_power_posterior_sharded(pp, key, jnp.zeros(model.num_params, jnp.float32),
                                      (x, y), 400, 100, mesh=mesh, axis_name="chains")
    print("sharded ladder:", rec["sample"].shape)

    # 3. sharded SMC
    smc = SMCSampler(model, num_particles=512 * n_dev, mutation="MALA",
                     mutation_step=0.05, num_mutation_steps=2)
    particles, log_w, diags = run_smc_sharded(smc, key, (x, y), mesh=mesh,
                                              axis_name="chains")
    print("sharded SMC:", particles.shape, "log-evidence:", round(diags["log_evidence"], 3))


if __name__ == "__main__":
    main()
