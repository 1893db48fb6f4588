"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Tests validate numerics in f64 against the reference semantics (the reference
defaults to torch.float64); multi-chip sharding tests use the 8 virtual CPU
devices. Real-TPU speed runs happen in bench.py, not here.

NOTE: this container pre-imports jax via sitecustomize and pins
JAX_PLATFORMS=axon (the tunneled TPU), so the platform must be forced back to
CPU through jax.config, not the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
