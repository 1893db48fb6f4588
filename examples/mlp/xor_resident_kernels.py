"""The VMEM-resident Pallas fast path: whole-loop HMC / MALA / MH / Gibbs,
plus the dense chain-tile variants (chains on sublanes AND lanes, the fast
path for sub-8-row datasets like XOR — ops/mlp_dense.py).

Runs the XOR MLP(2,2,1) posterior with each resident kernel and prints
throughput + posterior diagnostics. TPU-only (the on-core PRNG has no CPU
lowering); on this container run it as `python examples/mlp/xor_resident_kernels.py`.

See docs/GUIDE.md section 8 for chain_block sizing rules.
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_eeyore")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.ops.resident_hmc import make_resident_hmc
from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense
from eeyore_tpu.ops.resident_tempering import make_resident_tempering
from eeyore_tpu.ops.resident_tempering_dense import make_resident_tempering_dense
from eeyore_tpu.ops.resident_walk import (
    make_resident_gibbs,
    make_resident_mala,
    make_resident_mh,
)
from eeyore_tpu.ops.resident_walk_dense import (
    make_resident_gibbs_dense,
    make_resident_mala_dense,
    make_resident_mh_dense,
)

NUM_CHAINS = 16384
NUM_ITERS = 1024
BURNIN = 512

x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
model = MLP(loss=loss_functions["binary_classification"],
            hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)

kernels = {
    "hmc": make_resident_hmc(model, x, y, step=0.05, num_steps=10,
                             num_iters=NUM_ITERS, num_burnin_iters=BURNIN,
                             chain_block=4096),
    "mala": make_resident_mala(model, x, y, step=0.05,
                               num_iters=NUM_ITERS, num_burnin_iters=BURNIN,
                               chain_block=4096),
    "mh": make_resident_mh(model, x, y, scale=0.1,
                           num_iters=NUM_ITERS, num_burnin_iters=BURNIN,
                           chain_block=4096),
    "gibbs": make_resident_gibbs(model, x, y, scales=0.5,
                                 num_iters=NUM_ITERS, num_burnin_iters=BURNIN,
                                 chain_block=4096),
    # 4096 lanes = 512 independent 8-rung temperature ladders per block;
    # counts column 0 = within-chain accepts, column 1 = swap accepts
    "tempering": make_resident_tempering(model, x, y, num_rungs=8, step=0.05,
                                         sampler="MALA", between_step=10,
                                         num_iters=NUM_ITERS,
                                         num_burnin_iters=BURNIN,
                                         chain_block=4096),
    # dense chain-tile variants: same semantics, ~1.4-2.9x on XOR-sized data
    "hmc-dense": make_resident_hmc_dense(model, x, y, step=0.05, num_steps=10,
                                         num_iters=NUM_ITERS,
                                         num_burnin_iters=BURNIN,
                                         chain_block=8192),
    "mala-dense": make_resident_mala_dense(model, x, y, step=0.05,
                                           num_iters=NUM_ITERS,
                                           num_burnin_iters=BURNIN,
                                           chain_block=8192),
    "mh-dense": make_resident_mh_dense(model, x, y, scale=0.1,
                                       num_iters=NUM_ITERS,
                                       num_burnin_iters=BURNIN,
                                       chain_block=8192),
    "tempering-dense": make_resident_tempering_dense(
        model, x, y, num_rungs=8, step=0.05, sampler="MALA", between_step=10,
        num_iters=NUM_ITERS, num_burnin_iters=BURNIN, chain_block=8192),
    "gibbs-dense": make_resident_gibbs_dense(model, x, y, scales=0.5,
                                             num_iters=NUM_ITERS,
                                             num_burnin_iters=BURNIN,
                                             chain_block=8192),
}

theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                  (NUM_CHAINS, model.num_params), dtype=jnp.float32)

for name, make in kernels.items():
    fn = jax.jit(make)
    samples, final, acc = fn(7, theta0s)          # compile + run
    jax.block_until_ready(final)
    t0 = time.perf_counter()
    samples, final, acc = fn(7, theta0s)
    jax.block_until_ready(final)
    elapsed = time.perf_counter() - t0

    kept = NUM_ITERS - BURNIN
    if name.startswith("tempering"):
        # counts [C, 2]: within-chain accepts / swap accepts; posterior
        # samples live on the COLDEST rung (every 8th lane, last in ladder)
        acc_rate = float(np.asarray(acc)[:, 0].mean()) / kept
        pooled = np.asarray(samples[:, 7::8][:, :512, :], dtype=np.float64)
    else:
        acc_rate = float(np.asarray(acc).mean()) / kept
        pooled = np.asarray(samples[:, :512, :], dtype=np.float64)  # [kept, 512, P]
    print(f"{name:6s} {NUM_CHAINS * NUM_ITERS / elapsed:14,.0f} samples/s  "
          f"acceptance {acc_rate:.3f}  "
          f"posterior mean head {np.round(pooled.mean((0, 1))[:3], 3)}")
