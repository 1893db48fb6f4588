"""Bayesian MLP over a flat parameter vector.

Flat theta layout contract (identical to the reference, which concatenates
each torch ``nn.Linear``'s row-major weight then bias,
/root/reference/eeyore/models/model.py:38-55): for each layer l,
``W_l`` of shape (dims[l+1], dims[l]) flattened row-major, then ``b_l`` of
shape (dims[l+1],) when bias[l]. This layout is what the Gibbs node-blocking
index functions (reference mlp.py:56-103) address.
"""

import itertools

import jax
import jax.numpy as jnp

from eeyore_tpu.models.model import BayesianModel
from eeyore_tpu.models.priors import IIDNormalPrior


def sigmoid(x):
    return jax.nn.sigmoid(x)


class Hyperparameters:
    """MLP architecture spec (reference mlp.py:9-19): ``dims`` incl. input and
    output sizes, per-layer ``bias`` flags and ``activations`` (None = linear
    output). Requires len(dims) >= 3 and len(activations) == len(dims) - 1."""

    def __init__(self, dims=(1, 2, 1), bias=None, activations="default"):
        self.dims = list(dims)
        num_layers = len(self.dims) - 1
        self.bias = list(bias) if bias is not None else [True] * num_layers
        if activations == "default":
            self.activations = [sigmoid] * num_layers
        else:
            self.activations = list(activations)

        if len(self.dims) < 3:
            raise ValueError("MLP needs at least one hidden layer (len(dims) >= 3)")
        if len(self.dims) != len(self.activations) + 1:
            raise ValueError("len(dims) must equal len(activations) + 1")
        if len(self.bias) != num_layers:
            raise ValueError("len(bias) must equal len(dims) - 1")


class MLP(BayesianModel):
    def __init__(self, loss, hparams=None, prior=None, temperature=None, dtype=None,
                 matmul_precision=jax.lax.Precision.HIGH):
        super().__init__(loss, prior=prior, temperature=temperature, dtype=dtype)
        self.matmul_precision = matmul_precision
        self.hp = hparams or Hyperparameters()
        self._layer_shapes = self._compute_layer_shapes()
        self.num_params = sum(
            w_size + b_size for (_, w_size, b_size) in self._layer_shapes
        )
        self.prior = prior or self.default_prior()

    def default_prior(self):
        return IIDNormalPrior.standard(self.num_params, dtype=self.dtype)

    def _compute_layer_shapes(self):
        shapes = []
        for l in range(len(self.hp.dims) - 1):
            d_in, d_out = self.hp.dims[l], self.hp.dims[l + 1]
            shapes.append(((d_out, d_in), d_in * d_out, d_out if self.hp.bias[l] else 0))
        return shapes

    def unpack(self, theta):
        """Split flat theta into [(W_l, b_l or None)] per layer."""
        layers = []
        i = 0
        for (w_shape, w_size, b_size) in self._layer_shapes:
            w = theta[..., i:i + w_size].reshape(theta.shape[:-1] + w_shape)
            i += w_size
            b = theta[..., i:i + b_size] if b_size else None
            i += b_size
            layers.append((w, b))
        return layers

    def pack(self, layers):
        """Inverse of unpack: flatten [(W, b)] back into theta."""
        parts = []
        for (w, b) in layers:
            parts.append(w.reshape(w.shape[:-2] + (-1,)))
            if b is not None:
                parts.append(b)
        return jnp.concatenate(parts, axis=-1)

    def forward(self, theta, x):
        """x: [batch, dims[0]] -> [batch, dims[-1]] (reference mlp.py:45-50).

        Matmuls are pinned to ``self.matmul_precision`` (default
        Precision.HIGH, a 3-pass bf16 product): on TPU the f32 default is a
        single bf16 MXU pass, whose rounding inflates the leapfrog energy
        error enough to drop iris HMC acceptance from the true 0.97 to 0.89
        (measured against the f64 oracle; HIGH and HIGHEST both restore
        0.9705, HIGH is ~25% faster end-to-end).
        """
        h = x
        for (w, b), activation in zip(self.unpack(theta), self.hp.activations):
            h = jnp.matmul(h, w.T, precision=self.matmul_precision)
            if b is not None:
                h = h + b
            if activation is not None:
                h = activation(h)
        return h

    # ------------------------------------------------------------------
    # Gibbs node-blocking geometry (reference mlp.py:56-103).
    # A parameter block = all incoming weights + bias of one hidden/output
    # node. All pure-Python / static: computed at trace time.
    # ------------------------------------------------------------------

    def num_hidden_layers(self):
        return len(self.hp.dims) - 2

    def num_par_blocks(self):
        return sum(self.hp.dims[1:])

    def layer_and_node_from_par_block(self, b):
        """Map block id -> (layer index, node index within layer)."""
        cumulative = [0] + list(itertools.accumulate(self.hp.dims[1:]))
        for l in range(len(cumulative) - 1):
            if cumulative[l] <= b < cumulative[l + 1]:
                return l, b - cumulative[l]
        raise IndexError(f"block {b} out of range")

    def starting_par_block_idx(self, l):
        """Flat index where layer l's weights start."""
        s = 0
        for i in range(l):
            s += (self.hp.dims[i] + 1 if self.hp.bias[i] else self.hp.dims[i]) * self.hp.dims[i + 1]
        return s

    def starting_par_block_indices(self):
        return [self.starting_par_block_idx(l) for l in range(len(self.hp.dims) - 1)]

    def annotated_par_block_indices(self, b):
        """Flat theta indices of block b: node n's weight row (row-major) and,
        if present, its bias entry (which sits after ALL of the layer's
        weights)."""
        l, n = self.layer_and_node_from_par_block(b)
        s = self.starting_par_block_idx(l)
        indices = list(range(s + n * self.hp.dims[l], s + (n + 1) * self.hp.dims[l]))
        if self.hp.bias[l]:
            indices.append(s + self.hp.dims[l] * self.hp.dims[l + 1] + n)
        return indices, l, n

    def par_block_indices(self, b):
        indices, _, _ = self.annotated_par_block_indices(b)
        return indices
