"""Worker for multiprocess_bench.py: time sample_chains_sharded on a mesh
that is either single-process (8 local devices) or one rank of a 2-process
group (4 local devices each). Prints one JSON line with the wall time.

Usage: python multiproc_bench_worker.py <mode> <port> <pid> <chains> <iters>
  mode: 'single' (8 local devices, no distributed init) or 'dist'
"""

import json
import os
import sys
import time

mode, port, pid = sys.argv[1], sys.argv[2], int(sys.argv[3])
chains, iters = int(sys.argv[4]), int(sys.argv[5])

local = 8 if mode == "single" else 4
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + [f"--xla_force_host_platform_device_count={local}"])

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from eeyore_tpu.models import DistributionModel
from eeyore_tpu.parallel.mesh import chain_mesh, initialize_distributed
from eeyore_tpu.parallel.sharded import sample_chains_sharded
from eeyore_tpu.samplers import MALA


def main():
    if mode == "dist":
        initialize_distributed(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    mesh = chain_mesh()
    assert len(mesh.devices.flat) == 8

    prec = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.5], [0.5, 1.0]])))
    model = DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    key = jax.random.PRNGKey(3)
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (chains, 2))

    def run():
        recorded, state = sample_chains_sharded(
            MALA(model, step=0.4), key, theta0s, data, num_iters=iters,
            num_burnin_iters=iters // 4, mesh=mesh)
        jax.block_until_ready(recorded["sample"])
        return recorded

    run()  # compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(json.dumps({"mode": mode, "pid": pid, "elapsed_s": best,
                      "samples_per_s": chains * iters / best}), flush=True)


if __name__ == "__main__":
    main()
