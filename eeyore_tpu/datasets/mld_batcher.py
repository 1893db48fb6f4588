"""Minimum-likelihood-distance (MLD) batch selection.

Reference: /root/reference/eeyore/datasets/mld_classification_batcher.py:11-90
(public API, unused by any reference sampler — experimental likelihood-aware
subsampling): among ``num_batches`` candidate class-stratified batches, pick
the one whose mean log-likelihood under two parameter vectors is closest to
the full-data mean log-likelihood.

Candidate index sets are drawn on the host (numpy); the 2 x num_batches
log-likelihood evaluations are vmapped device work.
"""

import numpy as np

import jax
import jax.numpy as jnp


class MLDBatcher:
    pass


class MLDClassificationBatcher(MLDBatcher):
    def __init__(self, num_batches, chunk_sizes, dataset=None, seed=0):
        self.num_batches = num_batches
        self.chunk_sizes = list(chunk_sizes)
        assert len(self.chunk_sizes) == 2
        self.rng = np.random.default_rng(seed)
        self.set_dataset(dataset)

    def set_dataset(self, dataset):
        self.dataset = dataset
        if dataset is None:
            return
        y = np.asarray(dataset.y)
        self.num_points = len(dataset)
        self.num_classes = y.shape[1]
        labels = np.argmax(y, axis=1)
        self.class_indices = [np.where(labels == c)[0] for c in range(self.num_classes)]
        self.class_props = [len(ci) / self.num_points for ci in self.class_indices]
        # per-chunk stratified counts (floor), remainder filled randomly
        self.class_num_batch_points = [
            [int(self.class_props[c] * self.chunk_sizes[k]) for c in range(self.num_classes)]
            for k in range(2)
        ]

    def batch_size(self):
        return sum(self.chunk_sizes)

    def _fill_class_sizes(self):
        counts = [list(c) for c in self.class_num_batch_points]
        for k in range(2):
            deficit = self.chunk_sizes[k] - sum(counts[k])
            for c in self.rng.choice(self.num_classes, size=deficit):
                counts[k][c] += 1
        return counts

    def _candidate_indices(self):
        counts = self._fill_class_sizes()
        first, second = [], []
        for c in range(self.num_classes):
            chosen = self.rng.choice(self.class_indices[c], size=counts[0][c], replace=False)
            first.extend(chosen.tolist())
            rest = np.setdiff1d(self.class_indices[c], chosen)
            second.extend(self.rng.choice(rest, size=counts[1][c], replace=False).tolist())
        return sorted(first + second)

    def get_batch(self, model, params):
        """Pick the candidate batch whose mean log-lik (under both parameter
        vectors) is closest to the full-data mean log-lik."""
        x_full = jnp.asarray(self.dataset.x)
        y_full = jnp.asarray(self.dataset.y)
        candidates = [self._candidate_indices() for _ in range(self.num_batches)]

        best_dist = np.inf
        best_idx = candidates[0]
        for idx in candidates:
            idx_arr = np.asarray(idx)
            dist = 0.0
            for theta in params:
                full = float(model.log_lik(jnp.asarray(theta), x_full, y_full)) / self.num_points
                sub = float(model.log_lik(jnp.asarray(theta), x_full[idx_arr], y_full[idx_arr])) / len(idx)
                dist += abs(full - sub)
            dist = np.sqrt(dist)
            if dist < best_dist:
                best_dist = dist
                best_idx = idx_arr
        return np.asarray(self.dataset.x)[best_idx], np.asarray(self.dataset.y)[best_idx]
