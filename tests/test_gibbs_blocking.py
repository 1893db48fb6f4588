"""Pin the MLP Gibbs node-blocking geometry across architectures.

Expected literals were produced by executing the reference implementation
(/root/reference/eeyore/models/mlp.py:56-103) on each architecture; the
contract is the flat-theta layout of reference model.py:38-55 (per-layer
row-major weights, then biases).
"""

import pytest

from eeyore_tpu.models import mlp

CASES = [
    dict(dims=[2, 2, 1], bias=[True, True], num_par_blocks=3,
         layer_node=[(0, 0), (0, 1), (1, 0)], starting=[0, 6],
         blocks=[[0, 1, 4], [2, 3, 5], [6, 7, 8]]),
    dict(dims=[2, 3, 3, 2], bias=[True, True, True], num_par_blocks=8,
         layer_node=[(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1)],
         starting=[0, 9, 21],
         blocks=[[0, 1, 6], [2, 3, 7], [4, 5, 8], [9, 10, 11, 18], [12, 13, 14, 19],
                 [15, 16, 17, 20], [21, 22, 23, 27], [24, 25, 26, 28]]),
    dict(dims=[2, 3, 3, 2], bias=[False, True, True], num_par_blocks=8,
         layer_node=[(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1)],
         starting=[0, 6, 18],
         blocks=[[0, 1], [2, 3], [4, 5], [6, 7, 8, 15], [9, 10, 11, 16],
                 [12, 13, 14, 17], [18, 19, 20, 24], [21, 22, 23, 25]]),
    dict(dims=[2, 3, 3, 2], bias=[False, False, False], num_par_blocks=8,
         layer_node=[(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1)],
         starting=[0, 6, 15],
         blocks=[[0, 1], [2, 3], [4, 5], [6, 7, 8], [9, 10, 11],
                 [12, 13, 14], [15, 16, 17], [18, 19, 20]]),
    dict(dims=[2, 3, 3, 1, 2], bias=[False, True, False, True], num_par_blocks=9,
         layer_node=[(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (3, 0), (3, 1)],
         starting=[0, 6, 18, 21],
         blocks=[[0, 1], [2, 3], [4, 5], [6, 7, 8, 15], [9, 10, 11, 16],
                 [12, 13, 14, 17], [18, 19, 20], [21, 23], [22, 24]]),
    dict(dims=[4, 3, 3], bias=[True, True], num_par_blocks=6,
         layer_node=[(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)],
         starting=[0, 15],
         blocks=[[0, 1, 2, 3, 12], [4, 5, 6, 7, 13], [8, 9, 10, 11, 14],
                 [15, 16, 17, 24], [18, 19, 20, 25], [21, 22, 23, 26]]),
    dict(dims=[4, 3, 2, 3], bias=[True, True, True], num_par_blocks=8,
         layer_node=[(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (2, 0), (2, 1), (2, 2)],
         starting=[0, 15, 23],
         blocks=[[0, 1, 2, 3, 12], [4, 5, 6, 7, 13], [8, 9, 10, 11, 14],
                 [15, 16, 17, 21], [18, 19, 20, 22], [23, 24, 29], [25, 26, 30], [27, 28, 31]]),
]


def make_model(dims, bias):
    hp = mlp.Hyperparameters(dims=dims, bias=bias)
    return mlp.MLP(loss=lambda x, y: 0.0, hparams=hp)


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"{c['dims']}-{c['bias']}")
def test_blocking(case):
    model = make_model(case["dims"], case["bias"])
    assert model.num_par_blocks() == case["num_par_blocks"]
    assert [model.layer_and_node_from_par_block(b) for b in range(model.num_par_blocks())] \
        == case["layer_node"]
    assert model.starting_par_block_indices() == case["starting"]
    assert [model.par_block_indices(b) for b in range(model.num_par_blocks())] == case["blocks"]


def test_mnist_scale_consistency():
    """784-input MNIST-scale MLP: blocks tile the whole parameter vector."""
    model = make_model([784, 10, 10, 10, 10], [True] * 4)
    assert model.num_par_blocks() == 40
    all_indices = sorted(i for b in range(model.num_par_blocks()) for i in model.par_block_indices(b))
    assert all_indices == list(range(model.num_params))


def test_blocks_partition_params():
    for case in CASES:
        model = make_model(case["dims"], case["bias"])
        covered = sorted(i for b in range(model.num_par_blocks()) for i in model.par_block_indices(b))
        assert covered == list(range(model.num_params))
