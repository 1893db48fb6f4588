"""Chain-lane MLP log-posterior math, shared by the Pallas kernels.

Generates a pure function ``vg(theta [P, C]) -> (val [1, C], grad [P, C])``
built from unrolled per-unit elementwise ops (data points on sublanes,
chains on lanes) with a hand-derived backward pass — usable both inside
Pallas kernel bodies and as plain traced jnp code. See ops/fused_mlp.py for
the layout rationale.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def extract_arch(model):
    """Static architecture info from an MLP/LogisticRegression model."""
    from eeyore_tpu.models.losses import (
        binary_classification_loss,
        multiclass_classification_loss,
    )

    hp = model.hp
    dims = list(hp.dims) if hasattr(hp, "dims") else [hp.input_size, hp.output_size]
    bias = list(hp.bias) if isinstance(hp.bias, (list, tuple)) else [hp.bias]
    activations = hp.activations if hasattr(hp, "activations") else [hp.activation]

    if model.loss is binary_classification_loss:
        loss_kind = "bce"
        if activations[-1] is None:
            raise ValueError("BCE path expects a sigmoid output layer")
    elif model.loss is multiclass_classification_loss:
        loss_kind = "ce"
        if activations[-1] is not None:
            raise ValueError("CE path expects a linear (logits) output layer")
    else:
        raise ValueError("fused kernels support the registered BCE/CE losses only")
    for act in activations[:-1]:
        if act is None:
            raise ValueError("hidden activations must be sigmoid")

    num_layers = len(dims) - 1
    layer_offsets = []
    off = 0
    for l in range(num_layers):
        w_off = off
        off += dims[l] * dims[l + 1]
        b_off = off if bias[l] else None
        if bias[l]:
            off += dims[l + 1]
        layer_offsets.append((w_off, b_off))
    assert off == model.num_params
    return dims, bias, loss_kind, layer_offsets


def prepare_data(model, x, y):
    """Pad data to sublane multiples; pack prior constants."""
    x = np.asarray(x)
    y = np.asarray(y)
    n = x.shape[0]
    n_pad = ((max(n, 8) + 7) // 8) * 8

    x_pad = np.zeros((n_pad, x.shape[1]), dtype=np.float32)
    x_pad[:n] = x
    y_pad = np.zeros((n_pad, y.shape[1]), dtype=np.float32)
    y_pad[:n] = y
    row_mask = np.zeros((n_pad, 1), dtype=np.float32)
    row_mask[:n] = 1.0

    P = model.num_params
    prior_loc = np.asarray(model.prior.loc, dtype=np.float32).reshape(P, 1)
    prior_inv_var = (1.0 / np.asarray(model.prior.scale, dtype=np.float32) ** 2).reshape(P, 1)
    prior_const = float(np.sum(
        -np.log(np.asarray(model.prior.scale, dtype=np.float64))
        - 0.5 * math.log(2.0 * math.pi)))
    temperature = 1.0 if model.temperature is None else float(model.temperature)
    return x_pad, y_pad, row_mask, prior_loc, prior_inv_var, prior_const, temperature


def make_vg(model, x_pad, y_pad, row_mask, prior_loc, prior_inv_var, prior_const,
            temperature, with_grad=True):
    """Build vg(theta [P, C], x, y, mask, loc, ivar) -> (val [1,C], grad [P,C]).

    x/y/mask/loc/ivar are passed per call so the same function body works on
    VMEM refs sliced to arrays inside a kernel or on plain jnp arrays.

    With ``with_grad=False`` the backward pass is skipped entirely and the
    returned function yields only ``val [1, C]`` — the random-walk MH path
    (reference metropolis_hastings.py:44-54 needs no gradient).
    """
    dims, bias, loss_kind, layer_offsets = extract_arch(model)
    num_layers = len(dims) - 1
    n_pad = x_pad.shape[0]
    P = model.num_params

    def vg(theta, x, y, mask, loc, ivar):
        C = theta.shape[1]

        def w_row(l, j, i):
            w_off, _ = layer_offsets[l]
            return theta[w_off + j * dims[l] + i, :][None, :]

        def b_row(l, j):
            _, b_off = layer_offsets[l]
            return theta[b_off + j, :][None, :]

        h = [x[:, i][:, None] for i in range(dims[0])]
        acts = [h]
        zs = []
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
                acts.append([jax.nn.sigmoid(z) for z in z_l])
            else:
                acts.append(z_l)

        k_out = dims[-1]
        if loss_kind == "bce":
            log_lik = jnp.zeros((1, C), dtype=jnp.float32)
            deltas = []
            for j in range(k_out):
                z = zs[-1][j]
                yj = y[:, j][:, None]
                log_lik = log_lik + jnp.sum(
                    (yj * z - jax.nn.softplus(z)) * mask, axis=0, keepdims=True)
                if with_grad:
                    deltas.append((yj - acts[-1][j]) * mask)
        else:
            zmax = zs[-1][0]
            for j in range(1, k_out):
                zmax = jnp.maximum(zmax, zs[-1][j])
            sumexp = jnp.zeros((n_pad, C), dtype=jnp.float32)
            for j in range(k_out):
                sumexp = sumexp + jnp.exp(zs[-1][j] - zmax)
            lse = zmax + jnp.log(sumexp)
            picked = jnp.zeros((n_pad, C), dtype=jnp.float32)
            for j in range(k_out):
                picked = picked + y[:, j][:, None] * zs[-1][j]
            log_lik = jnp.sum((picked - lse) * mask, axis=0, keepdims=True)
            if with_grad:
                deltas = [(y[:, j][:, None] - jnp.exp(zs[-1][j] - lse)) * mask
                          for j in range(k_out)]

        diff = theta - loc
        log_prior = jnp.sum(-0.5 * diff * diff * ivar, axis=0,
                            keepdims=True) + prior_const
        val = temperature * (log_lik + log_prior)
        if not with_grad:
            return val

        grad_rows = [None] * P
        for l in reversed(range(num_layers)):
            w_off, b_off = layer_offsets[l]
            for j in range(dims[l + 1]):
                for i in range(dims[l]):
                    grad_rows[w_off + j * dims[l] + i] = jnp.sum(
                        deltas[j] * acts[l][i], axis=0, keepdims=True)
                if bias[l]:
                    grad_rows[b_off + j] = jnp.sum(deltas[j], axis=0, keepdims=True)
            if l > 0:
                new_deltas = []
                for i in range(dims[l]):
                    s = jnp.zeros((n_pad, C), dtype=jnp.float32)
                    for j in range(dims[l + 1]):
                        s = s + deltas[j] * w_row(l, j, i)
                    a = acts[l][i]
                    new_deltas.append(s * a * (1.0 - a))
                deltas = new_deltas

        grad = jnp.concatenate(grad_rows, axis=0)  # [P, C]
        grad = temperature * (grad - diff * ivar)
        return val, grad

    return vg
