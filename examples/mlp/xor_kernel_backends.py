"""The reference-shaped workflow on the kernel backends (round 4).

A user following the reference API (`SerialSampler.run` / `benchmark`,
reference serial_sampler.py:35-52) writes exactly this — build a model,
bind a transition kernel into the harness, run — and backend="auto"
(the default) routes the whole sampling loop onto the VMEM-resident Pallas
kernels whenever the configuration is eligible (TPU, full batch,
architecture-generated model, block-divisible chain count). The scanned
XLA path is the universal fallback and remains available as
backend="scan"; kernel-backed chains record sample + derived accepted
flags and draw from the on-core PRNG (statistically equivalent, not
bit-matched — samplers/dispatch.py documents the contract).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import time

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.samplers import HMC, NUTS, SamplerHarness, choose_max_depth, sample_chains
from eeyore_tpu.samplers.dispatch import resolve_backend


def main(num_chains=8192, num_epochs=1024, burnin_epochs=512):
    x = jnp.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=jnp.float32)
    y = jnp.asarray([[0.], [1.], [1.], [0.]], dtype=jnp.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    kernel = HMC(model, step=0.05, num_steps=10)

    plan, reason = resolve_backend(kernel, (x, y), num_chains,
                                   num_epochs, burnin_epochs)
    print("backend:", plan.backend if plan else f"scan ({reason})")

    # the reference-shaped single-chain workflow: run() on the harness.
    # On TPU this executes one chain_block of kernel chains and returns
    # chain 0 — kernel-class per-iteration wall for a single logical chain.
    h = SamplerHarness(kernel, (x, y), theta0=0.1 * jnp.ones(model.num_params),
                       key=jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    chain = h.run(num_epochs=num_epochs, num_burnin_epochs=burnin_epochs)
    print(f"run(): {len(chain)} kept draws, acceptance "
          f"{chain.acceptance_rate():.3f}, {time.perf_counter() - t0:.3f}s")

    # many chains through the same public API
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                      (num_chains, model.num_params), jnp.float32)
    t0 = time.perf_counter()
    chains = sample_chains(kernel, jax.random.PRNGKey(2), theta0s, (x, y),
                           num_iters=num_epochs, num_burnin_iters=burnin_epochs)
    wall = time.perf_counter() - t0
    print(f"sample_chains: {num_chains} chains x {num_epochs} iters, "
          f"{num_chains * num_epochs / wall / 1e6:.1f}M samples/s "
          f"(incl. one-time compile)")

    # fixed-budget NUTS with the auto-selected depth (the dense NUTS kernel
    # dispatches the same way)
    d, step = choose_max_depth(model, (x, y), step=0.1, num_warmup=256,
                               num_chains=16, key=jax.random.PRNGKey(3))
    print(f"depth probe: frozen max_depth={d}, tuned step={step:.4f}")
    nuts = NUTS(model, step=step, max_depth=d, fixed_budget=True)
    rec = sample_chains(nuts, jax.random.PRNGKey(4), theta0s, (x, y),
                        num_iters=num_epochs, num_burnin_iters=burnin_epochs,
                        return_arrays=True)
    print("NUTS sample mean:", np.asarray(rec["sample"]).mean(axis=(0, 1)).round(3))

    # round 5: explicitly requesting target_val turns on IN-KERNEL extras
    # recording — exact per-iteration log-target values + accepted flags,
    # packed into the record DMA's spare rows (no extra transfers)
    rec = sample_chains(kernel, jax.random.PRNGKey(5), theta0s, (x, y),
                        num_iters=num_epochs, num_burnin_iters=burnin_epochs,
                        record_keys=("sample", "accepted", "target_val"),
                        return_arrays=True)
    print(f"in-kernel extras: mean log-target "
          f"{float(np.asarray(rec['target_val']).mean()):.3f}, "
          f"acceptance {float(np.asarray(rec['accepted']).mean()):.3f}")


if __name__ == "__main__":
    main()
