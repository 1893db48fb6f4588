"""Device-mesh helpers for chain- and temperature-axis sharding.

The scaling axes in this domain are chains/particles and the tempering
ladder (SURVEY.md section 5: no sequence axis exists — the reference's
multi-chain constructs are serial Python loops). Meshes here follow the
scaling-book recipe: chains (the DP analog) shard across the slowest links
(DCN/between hosts) since chains are embarrassingly parallel; the temperature
axis (whose swap collectives are latency-sensitive) stays within a slice so
ppermute rides ICI.
"""

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up: jax.distributed.initialize (no-op if single
    process args are absent)."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes, process_id=process_id)


def chain_mesh(num_devices=None, axis_name="chains", devices=None):
    """1-D mesh over the chain axis."""
    devices = devices if devices is not None else jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def ladder_mesh(num_chain_shards, num_temp_shards, devices=None,
                chain_axis="chains", temp_axis="temp"):
    """2-D mesh (chains, temp): temperature swaps stay within the fast axis."""
    devices = devices if devices is not None else jax.devices()
    n = num_chain_shards * num_temp_shards
    grid = np.asarray(devices[:n]).reshape(num_chain_shards, num_temp_shards)
    return Mesh(grid, (chain_axis, temp_axis))


def chain_sharding(mesh, axis_name="chains"):
    """Shard the leading (chain) axis, replicate the rest."""
    return NamedSharding(mesh, PartitionSpec(axis_name))
