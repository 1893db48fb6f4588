"""Blocked Metropolis-within-Gibbs over MLP node-blocks.

Reference semantics: /root/reference/eeyore/samplers/gibbs.py:10-102 — one
systematic sweep per draw over the model's parameter blocks (all incoming
weights + bias of one node, mlp.py:56-103), each optionally split into
sub-blocks via chunk_evenly, proposed with a per-block-scale Normal kernel
and accepted with a full-log-target MH test. ``accepted`` is a per-sub-block
0/1 vector, enabling block acceptance rates.

TPU design: the blocking is computed in Python at trace time (static per
architecture); sub-blocks are padded to a common width and the sweep is a
``lax.scan`` over the stacked (indices, mask, scale) arrays with masked
scatter updates — one log-target evaluation per sub-block.

Note: the reference keeps REJECTED coordinates inside its ``proposed`` vector
for the rest of the sweep (gibbs.py:81-94 never restores them), so later
sub-block targets are evaluated at a vector that differs from the current
state in rejected coordinates. That is a defect of the reference (it breaks
detailed balance of the sweep); here rejected sub-blocks are restored before
the next sub-block proposal.
"""

import json

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.samplers.base import TransitionKernel
from eeyore_tpu.utils import chunk_evenly


class GibbsState(NamedTuple):
    sample: jax.Array
    target_val: jax.Array
    accepted: jax.Array  # [num_sub_blocks] 0/1


class Gibbs(TransitionKernel):
    state_keys = ("sample", "target_val", "accepted")

    def __init__(self, model, scales=1.0, node_subblock_size=None, recompute_current=False):
        super().__init__(model, recompute_current=recompute_current)
        if not hasattr(model, "num_par_blocks"):
            raise ValueError(
                "Gibbs needs a model exposing parameter blocks "
                "(num_par_blocks / par_block_indices, e.g. eeyore_tpu.models.MLP); "
                f"{type(model).__name__} does not")
        num_blocks = model.num_par_blocks()

        if isinstance(scales, float):
            scales = [scales] * num_blocks
        self.scales = list(scales)

        if node_subblock_size is None:
            node_subblock_size = [None] * num_blocks
        self.node_subblock_size = node_subblock_size

        # Static blocking, computed once (trace-time).
        self._sub_blocks = []  # list of (indices, scale)
        for b in range(num_blocks):
            indices = model.par_block_indices(b)
            if node_subblock_size[b] is None:
                subs = [indices]
            else:
                subs = list(chunk_evenly(indices, node_subblock_size[b]))
            for sub in subs:
                self._sub_blocks.append((sub, self.scales[b]))

        self.num_sub_blocks = len(self._sub_blocks)
        width = max(len(sub) for sub, _ in self._sub_blocks)
        idx = np.zeros((self.num_sub_blocks, width), dtype=np.int32)
        mask = np.zeros((self.num_sub_blocks, width))
        for i, (sub, _) in enumerate(self._sub_blocks):
            idx[i, :len(sub)] = sub
            mask[i, :len(sub)] = 1.0
        self._idx = jnp.asarray(idx)
        self._mask = jnp.asarray(mask)
        self._scales = jnp.asarray([s for _, s in self._sub_blocks])

    def get_blocks(self):
        """Blocking as a list-of-lists per node block (reference gibbs.py:45-57)."""
        blocks = []
        i = 0
        for b in range(self.model.num_par_blocks()):
            indices = self.model.par_block_indices(b)
            if self.node_subblock_size[b] is None:
                subs = [indices]
            else:
                subs = list(chunk_evenly(indices, self.node_subblock_size[b]))
            blocks.append(subs)
            i += len(subs)
        return blocks

    def save_blocks(self, path="gibbs_blocks.txt", mode="w"):
        with open(path, mode) as f:
            json.dump(self.get_blocks(), f)

    def init(self, theta, x, y, key=None):
        theta = jnp.asarray(theta)
        return GibbsState(
            sample=theta,
            target_val=self.log_target(theta, x, y),
            accepted=jnp.zeros(self.num_sub_blocks, dtype=jnp.int32),
        )

    def step(self, key, state, x, y, iteration=None):
        dtype = state.sample.dtype
        current_target = (
            self.log_target(state.sample, x, y) if self.recompute_current else state.target_val
        )

        def body(carry, inputs):
            sample, target = carry
            idx, mask, scale, sub_key = inputs
            key_z, key_acc = jax.random.split(sub_key)

            z = scale * jax.random.normal(key_z, idx.shape, dtype=dtype) * mask
            proposed = sample.at[idx].add(z)  # padded lanes add 0
            proposed_target = self.log_target(proposed, x, y)

            log_rate = proposed_target - target
            accept = jnp.log(jax.random.uniform(key_acc, dtype=dtype)) < log_rate

            sample = jnp.where(accept, proposed, sample)
            target = jnp.where(accept, proposed_target, target)
            return (sample, target), accept.astype(jnp.int32)

        sub_keys = jax.random.split(key, self.num_sub_blocks)
        (sample, target), accepted = jax.lax.scan(
            body, (state.sample, current_target),
            (self._idx, self._mask, self._scales, sub_keys),
        )

        new_state = GibbsState(sample=sample, target_val=target, accepted=accepted)
        return new_state, new_state._asdict()
