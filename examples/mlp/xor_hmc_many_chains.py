"""The TPU-native flagship: thousands of HMC chains over the Bayesian
MLP(2,2,1) XOR posterior in one compiled program, with cross-chain
diagnostics (multivariate R-hat, pooled ESS) and the Pallas fused-kernel
fast path.

This is what replaces the reference's one-chain-at-a-time loop
(serial_sampler.py:41-52): the chain axis is a vmapped (and, multi-chip,
sharded) tensor dimension.
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import time

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.chains import ChainLists
from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.ops.fused_hmc import FusedHMC
from eeyore_tpu.samplers import HMC, sample_chains


def main(num_chains=1024, num_iters=1500, burnin=500):
    x = jnp.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=jnp.float32)
    y = jnp.asarray([[0.], [1.], [1.], [0.]], dtype=jnp.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    theta0s = 0.1 * jax.random.normal(key, (num_chains, model.num_params), dtype=jnp.float32)

    # generic vmapped path
    kern = HMC(model, step=0.05, num_steps=10)
    start = time.perf_counter()
    chains = sample_chains(kern, key, theta0s, (x, y), num_iters, burnin)
    elapsed = time.perf_counter() - start
    kept = num_iters - burnin
    print(f"vmapped HMC: {num_chains} chains x {kept} kept iters "
          f"in {elapsed:.2f}s = {num_chains * num_iters / elapsed:,.0f} samples/s")
    rhat, *_ = chains.multi_rhat(method="iid")
    print(f"multivariate R-hat across {num_chains} chains: {rhat:.4f}")
    print("pooled posterior mean:", chains.get_samples().reshape(-1, model.num_params).mean(0).round(3))

    # fused Pallas path (TPU only; falls back to interpret on CPU)
    on_tpu = jax.devices()[0].platform == "tpu"
    fused = FusedHMC(model, np.asarray(x), np.asarray(y), step=0.05, num_steps=10,
                     chain_block=min(1024, num_chains), interpret=not on_tpu,
                     use_fused_kernel=True)
    state, rec = fused.run(key, theta0s, num_iters, burnin)
    jax.block_until_ready(state.thetas)
    start = time.perf_counter()
    state, rec = fused.run(key, theta0s, num_iters, burnin)
    jax.block_until_ready(state.thetas)
    elapsed = time.perf_counter() - start
    print(f"fused-kernel HMC: {num_chains * num_iters / elapsed:,.0f} samples/s")


if __name__ == "__main__":
    main()
