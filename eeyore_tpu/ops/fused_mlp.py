"""Pallas TPU kernel: fused log-posterior + gradient for chain-vmapped MLPs.

The hot primitive of every gradient-based sampler is
``upto_grad_log_target(theta, x, y)`` (reference
/root/reference/eeyore/models/log_target_model.py:20-23 — there, torch
autograd). For thousands of chains over a TINY MLP (dims <= tens), XLA's
autodiff graph becomes a long chain of small fused ops; this kernel instead
evaluates the whole forward+backward+prior for ALL chains in ONE kernel with
a hand-derived backward pass.

Layout: everything is chain-major on the VPU lane axis —
- theta [P, C]: one parameter per row, chains along lanes;
- activations [n_pad, C]: data points along sublanes, chains along lanes —
  so every network scalar is a [n_pad, C] tile and each weight update is a
  sublane reduction. No MXU is used: the contraction dims (<=10) are far
  below the 128x128 systolic array; the VPU over the chain axis is the right
  unit.

Supported architecture surface = the reference's model zoo: arbitrary
``dims``/``bias`` MLPs, sigmoid or linear activations, BCE (on sigmoid
probabilities) or softmax-CE (on logits) losses, iid Normal prior,
temperature scaling of (log_lik + log_prior).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def sigmoid_stable(z):
    return jax.nn.sigmoid(z)


def make_fused_log_target_vg(model, x, y, chain_block=1024, interpret=False):
    """Build ``fn(thetas [C, P]) -> (values [C], grads [C, P])`` computing the
    tempered log posterior and its gradient for every chain in one Pallas
    kernel. ``C`` must be a multiple of ``chain_block`` (pad at call site).

    ``model``: eeyore_tpu.models.MLP (or LogisticRegression-shaped) with an
    IIDNormalPrior; loss must be the registered BCE or CE.
    """
    from eeyore_tpu.models.losses import (
        binary_classification_loss,
        multiclass_classification_loss,
    )

    hp = model.hp
    dims = list(hp.dims) if hasattr(hp, "dims") else [hp.input_size, hp.output_size]
    bias = list(hp.bias) if isinstance(hp.bias, (list, tuple)) else [hp.bias]
    activations = hp.activations if hasattr(hp, "activations") else [hp.activation]
    num_layers = len(dims) - 1
    P = model.num_params

    if model.loss is binary_classification_loss:
        loss_kind = "bce"
        if activations[-1] is None:
            raise ValueError("BCE path expects a sigmoid output layer")
    elif model.loss is multiclass_classification_loss:
        loss_kind = "ce"
        if activations[-1] is not None:
            raise ValueError("CE path expects a linear (logits) output layer")
    else:
        raise ValueError("fused kernel supports the registered BCE/CE losses only")

    for act in activations[:-1]:
        if act is None:
            raise ValueError("hidden activations must be sigmoid")

    x = np.asarray(x)
    y = np.asarray(y)
    n, d_in = x.shape
    assert d_in == dims[0]
    n_pad = _round_up(max(n, 8), 8)

    x_pad = np.zeros((n_pad, dims[0]), dtype=np.float32)
    x_pad[:n] = x
    y_pad = np.zeros((n_pad, y.shape[1]), dtype=np.float32)
    y_pad[:n] = y
    row_mask = np.zeros((n_pad, 1), dtype=np.float32)
    row_mask[:n] = 1.0

    prior_loc = np.asarray(model.prior.loc, dtype=np.float32).reshape(P, 1)
    prior_inv_var = (1.0 / np.asarray(model.prior.scale, dtype=np.float32) ** 2).reshape(P, 1)
    prior_const = float(np.sum(
        -np.log(np.asarray(model.prior.scale, dtype=np.float64))
        - 0.5 * math.log(2.0 * math.pi)))
    temperature = 1.0 if model.temperature is None else float(model.temperature)

    # static (row-offset) layout of theta: per layer, weight rows then bias rows
    layer_offsets = []
    off = 0
    for l in range(num_layers):
        w_off = off
        off += dims[l] * dims[l + 1]
        b_off = off if bias[l] else None
        if bias[l]:
            off += dims[l + 1]
        layer_offsets.append((w_off, b_off))
    assert off == P

    def kernel(theta_ref, x_ref, y_ref, mask_ref, loc_ref, ivar_ref,
               val_ref, grad_ref):
        C = theta_ref.shape[1]
        mask = mask_ref[:, :]  # [n_pad, 1]

        def w_row(l, j, i):
            """weight (out j, in i) of layer l as a [1, C] row."""
            w_off, _ = layer_offsets[l]
            return theta_ref[w_off + j * dims[l] + i, :][None, :]

        def b_row(l, j):
            _, b_off = layer_offsets[l]
            return theta_ref[b_off + j, :][None, :]

        # ---------- forward ----------
        # acts[l][j]: [n_pad, C] activation of unit j after layer l
        h = [x_ref[:, i][:, None] for i in range(dims[0])]  # [n_pad, 1] each
        acts = [h]
        zs = []  # pre-activations per layer (list of [n_pad, C])
        for l in range(num_layers):
            z_l = []
            for j in range(dims[l + 1]):
                z = jnp.zeros((n_pad, C), dtype=jnp.float32)
                for i in range(dims[l]):
                    z = z + acts[l][i] * w_row(l, j, i)
                if bias[l]:
                    z = z + b_row(l, j)
                z_l.append(z)
            zs.append(z_l)
            if l < num_layers - 1 or loss_kind == "bce":
                acts.append([sigmoid_stable(z) for z in z_l])
            else:
                acts.append(z_l)  # logits out

        # ---------- loss value + output delta ----------
        # delta[j] = d log_lik / d z_out_j  (tempered later), [n_pad, C]
        k_out = dims[-1]
        if loss_kind == "bce":
            # log_lik = sum_n,mask [y z - softplus(z)] (sigmoid+BCE fused)
            log_lik = jnp.zeros((1, C), dtype=jnp.float32)
            deltas = []
            for j in range(k_out):
                z = zs[-1][j]
                yj = y_ref[:, j][:, None]
                log_lik = log_lik + jnp.sum(
                    (yj * z - jax.nn.softplus(z)) * mask, axis=0, keepdims=True)
                deltas.append((yj - acts[-1][j]) * mask)
        else:
            # CE on logits: log_lik = sum_n [sum_j y_j z_j - logsumexp(z)]
            zmax = zs[-1][0]
            for j in range(1, k_out):
                zmax = jnp.maximum(zmax, zs[-1][j])
            sumexp = jnp.zeros((n_pad, C), dtype=jnp.float32)
            for j in range(k_out):
                sumexp = sumexp + jnp.exp(zs[-1][j] - zmax)
            lse = zmax + jnp.log(sumexp)
            picked = jnp.zeros((n_pad, C), dtype=jnp.float32)
            for j in range(k_out):
                picked = picked + y_ref[:, j][:, None] * zs[-1][j]
            log_lik = jnp.sum((picked - lse) * mask, axis=0, keepdims=True)
            deltas = [
                (y_ref[:, j][:, None] - jnp.exp(zs[-1][j] - lse)) * mask
                for j in range(k_out)
            ]

        # ---------- backward ----------
        # walk layers top-down; delta at layer l+1 units -> grads of layer l
        for l in reversed(range(num_layers)):
            # weight/bias grads
            for j in range(dims[l + 1]):
                for i in range(dims[l]):
                    g = jnp.sum(deltas[j] * acts[l][i], axis=0)  # [C]
                    w_off, _ = layer_offsets[l]
                    grad_ref[w_off + j * dims[l] + i, :] = g
                if bias[l]:
                    _, b_off = layer_offsets[l]
                    grad_ref[b_off + j, :] = jnp.sum(deltas[j], axis=0)
            if l > 0:
                # propagate: delta_i = sigma'(z_i) * sum_j w_ji delta_j
                new_deltas = []
                for i in range(dims[l]):
                    s = jnp.zeros((n_pad, C), dtype=jnp.float32)
                    for j in range(dims[l + 1]):
                        s = s + deltas[j] * w_row(l, j, i)
                    a = acts[l][i]
                    new_deltas.append(s * a * (1.0 - a))
                deltas = new_deltas

        # ---------- prior + temperature ----------
        diff = theta_ref[:, :] - loc_ref[:, :]
        log_prior = jnp.sum(-0.5 * diff * diff * ivar_ref[:, :], axis=0,
                            keepdims=True) + prior_const
        val_ref[0, :] = temperature * (log_lik[0, :] + log_prior[0, :])
        grad_ref[:, :] = temperature * (grad_ref[:, :] - diff * ivar_ref[:, :])

    x_j = jnp.asarray(x_pad)
    y_j = jnp.asarray(y_pad)
    mask_j = jnp.asarray(row_mask)
    loc_j = jnp.asarray(prior_loc)
    ivar_j = jnp.asarray(prior_inv_var)

    def fn(thetas):
        thetas = jnp.asarray(thetas, dtype=jnp.float32)
        C = thetas.shape[0]
        if C % chain_block != 0:
            raise ValueError(f"num chains {C} must be a multiple of {chain_block}")
        theta_t = thetas.T  # [P, C]

        num_blocks = C // chain_block
        vals, grads = pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec((P, chain_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, dims[0]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, y_pad.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, chain_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, chain_block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((P, C), jnp.float32),
            ],
            interpret=interpret,
        )(theta_t, x_j, y_j, mask_j, loc_j, ivar_j)
        return vals[0], grads.T

    return fn


class FusedMLPModel:
    """Drop-in wrapper: a model whose ``upto_grad_log_target`` for a BATCH of
    chains goes through the fused kernel. Used by the fused samplers in
    eeyore_tpu.ops.fused_hmc."""

    def __init__(self, model, x, y, chain_block=1024, interpret=False):
        self.model = model
        self.vg = make_fused_log_target_vg(model, x, y, chain_block=chain_block,
                                           interpret=interpret)

    def batch_upto_grad_log_target(self, thetas):
        return self.vg(thetas)
