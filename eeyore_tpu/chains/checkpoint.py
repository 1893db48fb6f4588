"""Checkpoint / resume of FULL sampler state.

The reference can only resume from a stored sample — tuner averages, AM
covariance, RAM Cholesky factors are lost on restart (SURVEY.md section 5:
"Sampler internal state is NOT checkpointed"). Here any kernel state pytree
(including vmapped multi-chain states) round-trips through one .npz file;
the caller supplies a structurally-identical example state on load (states
are NamedTuples of arrays — no pickling).
"""

import numpy as np

import jax


def save_state(path, state):
    """Save a state pytree's leaves to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path, like):
    """Load a state saved by ``save_state``; ``like`` provides the pytree
    structure (e.g. a freshly-initialized state of the same kernel)."""
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    treedef = jax.tree_util.tree_structure(like)
    like_leaves = jax.tree_util.tree_leaves(like)
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, example state has {len(like_leaves)}")
    leaves = [np.asarray(l).astype(ref.dtype).reshape(np.shape(ref))
              for l, ref in zip(leaves, like_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
