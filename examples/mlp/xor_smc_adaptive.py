"""Adaptive-tempering SMC on the XOR MLP posterior: the ESS-bisection
ladder chooses each next temperature so the reweighted effective sample
size stays at half the particle count — easy paths collapse to a couple of
stages where the reference-style fixed quartic ladder always pays 10.

Run: python examples/mlp/xor_smc_adaptive.py  (CPU-friendly size)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.samplers import SMCSampler

x = jnp.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]])
y = jnp.asarray([[0.], [1.], [1.], [0.]])
model = MLP(loss=loss_functions["binary_classification"],
            hparams=mlp.Hyperparameters(dims=[2, 2, 1]))

fixed = SMCSampler(model, num_particles=2048, mutation="MALA",
                   mutation_step=0.1, num_mutation_steps=3)
adaptive = SMCSampler(model, num_particles=2048, betas="adaptive",
                      mutation="MALA", mutation_step=0.1,
                      num_mutation_steps=3, adaptive_target_ess=0.5)

state_f, diags_f = fixed.run(jax.random.PRNGKey(0), (x, y))
state_a, diags_a = adaptive.run(jax.random.PRNGKey(0), (x, y))

print(f"fixed quartic ladder: {len(np.asarray(diags_f['beta']))} stages, "
      f"log evidence {diags_f['log_evidence']:.3f}")
print(f"adaptive ladder:      {diags_a['num_stages']} stages "
      f"(betas {np.round(np.asarray(diags_a['beta']), 4)}), "
      f"log evidence {diags_a['log_evidence']:.3f}")
mean_f = np.asarray(SMCSampler.estimate(state_f))
mean_a = np.asarray(SMCSampler.estimate(state_a))
print(f"max posterior-mean difference: {np.abs(mean_f - mean_a).max():.4f}")
assert abs(diags_f["log_evidence"] - diags_a["log_evidence"]) < 0.2
assert diags_a["num_stages"] <= len(np.asarray(diags_f["beta"]))
