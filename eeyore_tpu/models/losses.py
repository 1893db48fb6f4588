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
    or 'sum').
    """
    loss = -(jnp.log(x) * y + jnp.log1p(-x) * (1 - y))
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
