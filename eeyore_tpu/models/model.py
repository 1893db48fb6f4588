"""Model abstraction: pure log-target functions over a flat theta vector.

The reference canonicalizes every model to a flat parameter vector via
``get_params``/``set_params`` (/root/reference/eeyore/models/model.py:38-55)
and defines the sampler-facing contract
``log_target(theta, x, y)`` / ``upto_grad_log_target(theta, x, y)``
(/root/reference/eeyore/models/log_target_model.py:12-23). Here models ARE
pure functions of ``theta`` — no parameter mutation, no autograd graph state;
``upto_grad_log_target`` is ``jax.value_and_grad``.

Temperature semantics follow the reference exactly: for Bayesian models the
temperature multiplies BOTH log-lik and log-prior
(/root/reference/eeyore/models/bayesian_model.py:30-50); for distribution
models it multiplies the log-pdf (distribution_model.py:25-26).
"""

import jax
import jax.numpy as jnp


class LogTargetModel:
    """Base: anything with a tempered ``log_target(theta, x, y)``."""

    temperature = None
    num_params = None

    def log_target(self, theta, x, y):
        raise NotImplementedError

    def upto_grad_log_target(self, theta, x, y):
        """(log_target, grad) in one pass — the hot primitive of every
        gradient-based sampler (reference: log_target_model.py:20-23)."""
        return jax.value_and_grad(self.log_target)(theta, x, y)

    def summary(self, theta=None, hashsummary=False):
        """Print a model summary (reference model.py:12-22 /
        bayesian_model.py:16-28); with a theta, optionally per-chunk sha256
        checksums of the flat parameter vector."""
        print(self)
        print("-" * 80)
        print(f"Number of model parameters: {self.num_params}")
        print("-" * 80)
        if getattr(self, "prior", None) is not None:
            print(f"Prior: {self.prior}")
            print("-" * 80)
        if hashsummary and theta is not None:
            print("Hash Summary:")
            for idx, hashvalue in enumerate(self.hashsummary(theta)):
                print(f"{idx}: {hashvalue}")

    def hashsummary(self, theta):
        """sha256 checksums of the flat theta, one per parameter group when
        the model exposes ``unpack``, else one for the whole vector
        (reference model.py:24-32)."""
        import hashlib

        import numpy as np

        theta = np.asarray(theta)
        if hasattr(self, "unpack"):
            chunks = []
            for w, b in self.unpack(theta):
                chunks.append(np.asarray(w))
                if b is not None:
                    chunks.append(np.asarray(b))
        else:
            chunks = [theta]
        return [hashlib.sha256(c.tobytes()).hexdigest() for c in chunks]

    def with_temperature(self, temperature):
        """Functional copy with a different temperature (for tempering
        ladders — replaces the reference's per-chain model deep copies,
        power_posterior_sampler.py:96-97)."""
        import copy

        new = copy.copy(self)
        new.temperature = temperature
        return new

    def _temper(self, val):
        if self.temperature is None:
            return val
        return self.temperature * val


class BayesianModel(LogTargetModel):
    """log-posterior = temperature * (log_lik + log_prior).

    Subclasses provide ``forward(theta, x)`` and set ``loss``, ``prior``,
    ``num_params`` (reference: bayesian_model.py:6-67).
    """

    def __init__(self, loss, prior=None, temperature=None, dtype=None):
        self.loss = loss
        self.prior = prior
        self.temperature = temperature
        self.dtype = dtype or jnp.zeros((), dtype=float).dtype

    def forward(self, theta, x):
        raise NotImplementedError

    def log_lik(self, theta, x, y):
        return self._temper(-self.loss(self.forward(theta, x), y))

    def log_prior(self, theta):
        return self._temper(jnp.sum(self.prior.log_prob(theta)))

    def log_target(self, theta, x, y):
        return self.log_lik(theta, x, y) + self.log_prior(theta)

    def lik(self, theta, x, y):
        return jnp.exp(self.log_lik(theta, x, y))

    def sample_prior(self, key):
        return self.prior.sample(key)

    def predictive_posterior(self, thetas, x, y):
        """Posterior-predictive MC integral of the likelihood over posterior
        samples, with NaN-dropping (reference: bayesian_model.py:58-60 +
        mcintegrator.py:16-30)."""
        from eeyore_tpu.integrators import MCIntegrator

        integrator = MCIntegrator(f=lambda s, xx, yy: self.lik(s, xx, yy), samples=thetas)
        return integrator.integrate(x, y)

    def predictive_posterior_from_dataset(self, thetas, dataset, num_points, key=None, shuffle=True):
        from eeyore_tpu.integrators import MCIntegrator

        integrator = MCIntegrator(f=lambda s, xx, yy: self.lik(s, xx, yy), samples=thetas)
        return integrator.integrate_from_dataset(dataset, num_points, key=key, shuffle=shuffle)


class DistributionModel(LogTargetModel):
    """Wraps an arbitrary ``log_pdf(theta, x, y)`` closure as a sampleable
    model (reference: distribution_model.py:6-28)."""

    def __init__(self, log_pdf, num_params, temperature=None, dtype=None):
        self.log_pdf = log_pdf
        self.num_params = num_params
        self.temperature = temperature
        self.dtype = dtype or jnp.zeros((), dtype=float).dtype

    def log_target(self, theta, x, y):
        return self._temper(self.log_pdf(theta, x, y))
