"""eeyore_tpu: a TPU-native Bayesian-neural-network MCMC framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``papamarkou/eeyore`` (reference mounted at /root/reference): Bayesian MLP /
logistic-regression / arbitrary log-density models with Gaussian priors and
tempering; a sampler zoo (MH, MALA, HMC with dual-averaging tuning, AM, RAM,
blocked Gibbs, DEMC, power-posterior tempering, SMC); chain storage and MCMC
diagnostics (multivariate ESS / R-hat, INSE MC covariance, MMD); and
posterior-predictive integration.

Architecture (TPU-first, not a port):
- models are pure functions over a flat parameter vector ``theta``
  (same flat layout contract as the reference: per-layer row-major weights
  then biases, cf. /root/reference/eeyore/models/model.py:38-55);
- samplers are pure transition kernels ``step(key, state, batch) -> state``
  run under ``jax.lax.scan``, vmapped over a chain axis, and sharded over
  TPU meshes with ``shard_map`` + XLA collectives;
- diagnostics are vectorized (matmul lag-covariances instead of the
  reference's O(n^2 p^2) Python loops).
"""

__version__ = "0.1.0"

from eeyore_tpu import (
    chains,
    datasets,
    integrators,
    kernels,
    linalg,
    models,
    ops,
    parallel,
    plots,
    samplers,
    stats,
    tuners,
    utils,
)
