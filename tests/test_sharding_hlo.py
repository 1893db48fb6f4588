"""Compiler-level scaling proof for chain-axis data parallelism.

The virtual CPU mesh shares physical cores, so wall-clock "scaling
efficiency" measured on it is noise. The sound claim is structural: chains
are independent, so the ENTIRE scanned sampling program partitions over the
chain axis with zero inter-device communication — weak scaling on real
hardware is then linear by construction (each chip runs the same local
program on its shard; there is nothing to wait for). This test pins that
property by compiling the sharded program on the 8-device mesh and asserting
the optimized HLO contains no collective ops; a ppermute positive control
shows the detector works.
"""

import numpy as np

import jax
import jax.numpy as jnp

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.samplers import HMC
from eeyore_tpu.samplers.runner import run_fn
from eeyore_tpu.datasets import as_schedule

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute", "all-to-all",
               "reduce-scatter")


def _hlo(jfn, *args):
    return jfn.lower(*args).compile().as_text()


def test_chain_sharded_hmc_has_no_collectives():
    x = jnp.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=jnp.float32)
    y = jnp.asarray([[0.], [1.], [1.], [0.]], dtype=jnp.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    kernel = HMC(model, step=0.05, num_steps=3)
    kernel.recompute_current = False
    schedule = as_schedule((x, y))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("chains",))
    sharding = NamedSharding(mesh, P("chains"))
    C = 16
    key = jax.random.PRNGKey(0)
    keys = jax.device_put(jax.random.split(key, C), sharding)
    theta0s = jax.device_put(
        0.1 * jax.random.normal(key, (C, model.num_params), dtype=jnp.float32),
        sharding)

    jfn = jax.jit(jax.vmap(run_fn(kernel, schedule, 8, 4, ("sample",))))
    text = _hlo(jfn, keys, theta0s)
    found = [c for c in COLLECTIVES if c in text]
    assert not found, f"chain-parallel hot loop should not communicate: {found}"


def test_detector_sees_ppermute():
    """Positive control: the same detector fires on a program that really
    communicates across the mesh."""
    from jax import shard_map

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("t",))

    def body(v):
        return jax.lax.ppermute(v, "t", [(i, (i + 1) % 8) for i in range(8)])

    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=P("t"), out_specs=P("t")))
    v = jax.device_put(jnp.arange(8.0), NamedSharding(mesh, P("t")))
    text = _hlo(fn, v)
    assert any(c in text for c in COLLECTIVES)
