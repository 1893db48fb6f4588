"""Loss functions with the reference's numerical semantics.

The reference registers two losses (/root/reference/eeyore/constants/constants.py:15-18):
- 'binary_classification': a hand-written BCE with sum reduction (the torch
  builtin broke second-order autodiff, cf. eeyore/stats/loss.py:1-10),
- 'multiclass_classification': CrossEntropyLoss(sum) applied to argmax'd
  one-hot labels.

Here both are pure jnp functions of (predictions, targets).
"""

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def binary_cross_entropy(x, y, reduction="mean"):
    """BCE on probabilities: -(log(x) y + log(1-x)(1-y)).

    Semantics of /root/reference/eeyore/stats/loss.py:1-10 (reduction 'mean'
    or 'sum'), with the 0*log(0) = 0 convention: in f32 the sigmoid
    saturates to exactly 1.0 for z > ~17, and the naive product then emits
    0 * log(0) = NaN for a correctly-classified point (poisoned the
    banknotes-LR SMC potentials under prior draws). A point saturated on
    the WRONG side still contributes -inf — a genuine zero-likelihood
    event at f32 probability resolution — which downstream
    logsumexp-weighted code handles (the Pallas kernels avoid both cases
    by evaluating in z-space, ops/mlp_math.py).
    """
    # double-where: the untaken branch's ARGUMENT is also replaced, else its
    # -inf primal/grad still reaches the product as 0 * inf = NaN through
    # the where cotangent (the standard jnp.where-NaN-grad pitfall)
    x_pos = jnp.where(y > 0, x, 1.0)
    x_neg = jnp.where(y < 1, x, 0.0)
    loss = -(y * jnp.log(x_pos) + (1 - y) * jnp.log1p(-x_neg))
    if reduction == "mean":
        return jnp.mean(loss)
    elif reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"unknown reduction {reduction!r}")


def cross_entropy(logits, y_onehot, reduction="sum"):
    """Softmax cross-entropy against one-hot labels.

    Equals torch ``nn.CrossEntropyLoss(reduction)(logits, argmax(y, 1))``
    as wired in /root/reference/eeyore/constants/constants.py:17:
    sum_i [logsumexp(logits_i) - logits_i[class_i]].
    """
    lse = logsumexp(logits, axis=-1)
    picked = jnp.sum(logits * y_onehot, axis=-1)
    loss = lse - picked
    if reduction == "mean":
        return jnp.mean(loss)
    elif reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"unknown reduction {reduction!r}")


def binary_classification_loss(x, y):
    return binary_cross_entropy(x, y, reduction="sum")


def multiclass_classification_loss(logits, y_onehot):
    return cross_entropy(logits, y_onehot, reduction="sum")


loss_functions = {
    "binary_classification": binary_classification_loss,
    "multiclass_classification": multiclass_classification_loss,
}
