"""Static batch schedules — the jit-friendly replacement for DataLoader.

XLA requires static shapes, so minibatches are precomputed into a stacked
array [num_batches, batch_size, ...] and the scanned sampler indexes batch
``i % num_batches`` per iteration (the reference's epoch loop over a
DataLoader, serial_sampler.py:41-42). Full-batch runs (every reference
example) use a single (x, y) pair.
"""

import jax
import jax.numpy as jnp
import numpy as np


class BatchSchedule:
    """Stacked minibatches: x [B, bs, dx], y [B, bs, dy]."""

    def __init__(self, x_batches, y_batches):
        self.x = jnp.asarray(x_batches)
        self.y = jnp.asarray(y_batches)
        self.num_batches = self.x.shape[0]

    @classmethod
    def full_batch(cls, x, y):
        return cls(jnp.asarray(x)[None], jnp.asarray(y)[None])

    @classmethod
    def from_dataset(cls, dataset, batch_size=None, key=None, drop_last=True):
        """Build a one-epoch schedule. With a PRNG ``key``, points are
        shuffled once; uneven tails are dropped (XLA static shapes)."""
        x = np.asarray(dataset.x)
        y = np.asarray(dataset.y)
        n = len(x)
        batch_size = batch_size or n
        if batch_size >= n:
            return cls(x[None], y[None])
        if key is not None:
            perm = np.asarray(jax.random.permutation(key, n))
            x, y = x[perm], y[perm]
        num_batches = n // batch_size
        if not drop_last and n % batch_size != 0:
            raise ValueError(
                "uneven last batch is not representable with static shapes; "
                "use drop_last=True or a batch_size dividing the dataset size"
            )
        end = num_batches * batch_size
        return cls(
            x[:end].reshape(num_batches, batch_size, *x.shape[1:]),
            y[:end].reshape(num_batches, batch_size, *y.shape[1:]),
        )

    def batch(self, i):
        """Batch for iteration i (cyclic)."""
        idx = i % self.num_batches
        return self.x[idx], self.y[idx]


def as_schedule(data):
    """Normalize user data into a BatchSchedule: accepts a BatchSchedule, an
    (x, y) tuple (full batch), or a dataset object with .x/.y."""
    if isinstance(data, BatchSchedule):
        return data
    if isinstance(data, tuple) and len(data) == 2:
        return BatchSchedule.full_batch(*data)
    if hasattr(data, "x") and hasattr(data, "y"):
        return BatchSchedule.full_batch(data.x, data.y)
    raise TypeError(f"cannot interpret {type(data)!r} as batch data")
