"""Posterior-predictive Monte-Carlo integration with NaN-dropping.

Reference: /root/reference/eeyore/integrators/mcintegrator.py:10-70 — the
integral is the running mean of f(sample, x, y) over posterior samples,
DROPPING NaN integrands and counting them. Here the whole integral is one
vmapped evaluation + masked mean instead of a Python loop.
"""

import jax
import jax.numpy as jnp
import numpy as np


class Integrator:
    pass


class MCIntegrator(Integrator):
    def __init__(self, f=None, samples=None):
        self.f = f
        self.samples = samples

    def integrate(self, x, y):
        """Returns (integral, num_dropped_samples). NaN integrands are
        excluded from the mean (reference mcintegrator.py:24-25)."""
        samples = jnp.asarray(self.samples)
        vals = jax.vmap(lambda s: self.f(s, x, y))(samples)
        nan_mask = jnp.isnan(vals)
        num_dropped = jnp.sum(nan_mask)
        kept = jnp.where(nan_mask, 0.0, vals)
        num_kept = vals.shape[0] - num_dropped
        integral = jnp.where(num_kept > 0, jnp.sum(kept) / jnp.maximum(num_kept, 1), 0.0)
        return integral, int(num_dropped)

    def integrate_from_dataset(self, dataset, num_points, key=None, shuffle=True):
        """Integrate over ``num_points`` single-point batches drawn from the
        dataset (reference mcintegrator.py:32-63). Returns
        (integrals, indices, nums_dropped)."""
        n = len(dataset)
        if shuffle:
            if key is None:
                key = jax.random.PRNGKey(0)
            order = np.asarray(jax.random.permutation(key, n))
        else:
            order = np.arange(n)
        # Cycle through the dataset if num_points > n (epoch semantics).
        idx = np.resize(order, num_points)

        integrals = np.empty(num_points)
        nums_dropped = np.empty(num_points, dtype=np.int64)
        for i, j in enumerate(idx):
            x, y = dataset.x[j:j + 1], dataset.y[j:j + 1]
            integral, dropped = self.integrate(x, y)
            integrals[i] = float(integral)
            nums_dropped[i] = dropped
        return integrals, idx, nums_dropped
