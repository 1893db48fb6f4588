"""Shared case definitions for the 2-process jax.distributed tests.

Both sides run the SAME sharded entry points with the SAME keys over an
8-device "chains" mesh — the pytest process on its single-process virtual
mesh (writing reference outputs to an .npz), the two workers on the
distributed 2-process mesh (comparing their addressable shards against the
reference). The collective key discipline in parallel/sharded.py depends
only on the mesh axis length, not the process layout, so same keys must
mean same draws; the only cross-layout numerical freedom is psum reduction
order in the SMC weight logsumexp (hence the 1e-9 tolerance there, vs
bit-exact for the ppermute-only tempering path).
"""

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import BayesianModel, DistributionModel, IIDNormalPrior
from eeyore_tpu.samplers import PowerPosteriorSampler, SMCSampler

EMPTY = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))

PP_ITERS, PP_BURNIN = 400, 100
SMC_PARTICLES = 4096


def bvn_model():
    prec = jnp.asarray(np.linalg.inv(np.array([[1.0, 0.5], [0.5, 1.0]])))
    return DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)


class ConjugateNormal(BayesianModel):
    """theta ~ N(0,1), y | theta ~ N(theta, 1)."""

    def __init__(self):
        super().__init__(loss=lambda pred, y: 0.5 * jnp.sum((pred - y) ** 2))
        self.num_params = 1
        self.prior = IIDNormalPrior.standard(1)

    def forward(self, theta, x):
        return jnp.broadcast_to(theta, x.shape[:1] + (1,))


def run_pp(mesh):
    from eeyore_tpu.parallel.sharded import run_power_posterior_sharded

    pp = PowerPosteriorSampler(bvn_model(), num_chains=8, sampler="MALA",
                               sampler_kwargs={"step": 0.5}, between_step=5,
                               swap_scheme="even_odd")
    recorded = run_power_posterior_sharded(
        pp, jax.random.PRNGKey(21), jnp.asarray([2.0, 2.0]), EMPTY,
        PP_ITERS, PP_BURNIN, mesh=mesh, axis_name="chains")
    return recorded["sample"]          # [8, kept, 2], sharded over chains


def run_smc(mesh):
    from eeyore_tpu.parallel.sharded import run_smc_sharded

    y0 = 1.0
    data = (jnp.zeros((1, 1)), jnp.full((1, 1), y0))
    smc = SMCSampler(ConjugateNormal(), num_particles=SMC_PARTICLES,
                     mutation="MALA", mutation_step=0.5, num_mutation_steps=2)
    particles, log_w, diags = run_smc_sharded(
        smc, jax.random.PRNGKey(22), data, mesh=mesh, axis_name="chains")
    return particles, log_w, diags["log_evidence"]


def run_mlp_dispatch_refusal():
    """Round-4 VERDICT item 8: a kernel-ELIGIBLE configuration (MLP model,
    full batch, chain count divisible by 1024) under the CPU multiprocess
    mesh must resolve backend="auto" to the scanned path — quietly, not as
    an error — and actually produce chains through it."""
    from eeyore_tpu.models import MLP, loss_functions, mlp
    from eeyore_tpu.samplers import MetropolisHastings, sample_chains
    from eeyore_tpu.samplers.dispatch import resolve_backend

    x = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
    y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]))
    kernel = MetropolisHastings(model, scale=0.1)

    # the same config IS eligible on a TPU...
    plan, _ = resolve_backend(kernel, (x, y), 1024, 8, platform="tpu")
    assert plan is not None
    # ...but under this process's CPU backend it must fall back with the
    # TPU-requirement reason, not raise
    plan, reason = resolve_backend(kernel, (x, y), 1024, 8, backend="auto")
    assert plan is None and "TPU" in reason, reason

    theta0s = 0.1 * jnp.ones((1024, model.num_params))
    out = sample_chains(kernel, jax.random.PRNGKey(5), theta0s, (x, y),
                        num_iters=8, return_arrays=True, backend="auto")
    assert out["sample"].shape == (1024, 8, model.num_params)
    return True
