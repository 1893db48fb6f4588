"""Pallas TPU kernel: fused log-posterior + gradient for chain-vmapped MLPs.

The hot primitive of every gradient-based sampler is
``upto_grad_log_target(theta, x, y)`` (reference
/root/reference/eeyore/models/log_target_model.py:20-23 — there, torch
autograd). For thousands of chains over a TINY MLP (dims <= tens), this
kernel evaluates the whole forward+backward+prior for ALL chains in ONE
Pallas kernel with a hand-derived backward pass.

Layout: chain-major on the VPU lane axis — theta [P, C] (one parameter per
row, chains along lanes); activations [n_pad, C] (data points along
sublanes). No MXU: the contraction dims (<=10) are far below the 128x128
systolic array; the VPU over the chain axis is the right unit. The math body
is shared with the VMEM-resident whole-loop kernel (ops/mlp_math.py,
ops/resident_hmc.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eeyore_tpu.ops.mlp_math import make_vg, prepare_data


def make_fused_log_target_vg(model, x, y, chain_block=1024, interpret=False):
    """Build ``fn(thetas [C, P]) -> (values [C], grads [C, P])`` computing the
    tempered log posterior and its gradient for every chain in one Pallas
    kernel. ``C`` must be a multiple of ``chain_block``.

    ``model``: eeyore_tpu.models.MLP (or LogisticRegression-shaped) with an
    IIDNormalPrior; loss must be the registered BCE or CE.
    """
    x_pad, y_pad, row_mask, loc, ivar, prior_const, temperature = prepare_data(model, x, y)
    vg_math = make_vg(model, x_pad, y_pad, row_mask, loc, ivar, prior_const, temperature)
    P = model.num_params
    n_pad, d_in = x_pad.shape
    k_out = y_pad.shape[1]

    def kernel(theta_ref, x_ref, y_ref, mask_ref, loc_ref, ivar_ref,
               val_ref, grad_ref):
        val, grad = vg_math(theta_ref[:, :], x_ref[:, :], y_ref[:, :],
                            mask_ref[:, :], loc_ref[:, :], ivar_ref[:, :])
        val_ref[:, :] = val
        grad_ref[:, :] = grad

    x_j = jnp.asarray(x_pad)
    y_j = jnp.asarray(y_pad)
    mask_j = jnp.asarray(row_mask)
    loc_j = jnp.asarray(loc)
    ivar_j = jnp.asarray(ivar)

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
                pl.BlockSpec((n_pad, d_in), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, k_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
