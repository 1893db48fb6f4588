"""Dense chain-tile MLP math (ops/mlp_dense.py) — the small-n layout used by
the dense resident kernels — validated as plain traced jnp code against
jax.value_and_grad on the model's log_target (same oracle pattern as
tests/test_mlp_math.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeyore_tpu.models import MLP, LogisticRegression, loss_functions, mlp
from eeyore_tpu.models import logistic_regression as lr
from eeyore_tpu.ops.mlp_dense import (
    MAX_DENSE_ROWS,
    make_vg_dense,
    stack_chains,
    unstack_chains,
)

RNG = np.random.default_rng(321)


def tiles_from(thetas):
    """[C, P] -> list of P [8, C//8] tiles (the dense kernel layout)."""
    C, P = thetas.shape
    dense = np.asarray(thetas, np.float32).T.reshape(P, 8, C // 8)
    return [jnp.asarray(dense[p]) for p in range(P)]


def check(model, x, y, C=64, with_grad=True):
    thetas = RNG.normal(size=(C, model.num_params)).astype(np.float32)
    vg = make_vg_dense(model, x, y, with_grad=with_grad)
    out = vg(tiles_from(thetas))
    ref_v, ref_g = jax.vmap(
        lambda t: jax.value_and_grad(model.log_target)(
            t, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    )(jnp.asarray(thetas))
    if with_grad:
        vals, grads = out
        got_g = np.stack([np.asarray(g).reshape(-1) for g in grads], axis=1)
        np.testing.assert_allclose(got_g, np.asarray(ref_g), rtol=2e-5, atol=2e-4)
    else:
        vals = out
    np.testing.assert_allclose(np.asarray(vals).reshape(-1), np.asarray(ref_v),
                               rtol=2e-5, atol=2e-4)


XOR_X = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
XOR_Y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)


def xor_model():
    return MLP(loss=loss_functions["binary_classification"],
               hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)


def test_bce_mlp221_xor():
    check(xor_model(), XOR_X, XOR_Y)


def test_bce_mlp221_xor_value_only():
    check(xor_model(), XOR_X, XOR_Y, with_grad=False)


def test_bce_deeper_no_bias():
    x = RNG.normal(size=(6, 3)).astype(np.float32)
    y = (RNG.random((6, 1)) > 0.5).astype(np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[3, 4, 2, 1], bias=[True, False, True],
                                            activations=[mlp.sigmoid] * 3),
                dtype=jnp.float32)
    check(model, x, y)


def test_ce_mlp433():
    x = RNG.normal(size=(12, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 12)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]),
                dtype=jnp.float32)
    check(model, x, y)


def test_logistic_regression():
    x = RNG.normal(size=(10, 6)).astype(np.float32)
    y = (RNG.random((10, 1)) > 0.5).astype(np.float32)
    model = LogisticRegression(loss=loss_functions["binary_classification"],
                               hparams=lr.Hyperparameters(input_size=6),
                               dtype=jnp.float32)
    check(model, x, y)


def test_tempered_target():
    model = xor_model()
    model.temperature = 0.37
    check(model, XOR_X, XOR_Y)


def test_rejects_large_n():
    x = np.zeros((MAX_DENSE_ROWS + 1, 2), dtype=np.float32)
    y = np.zeros((MAX_DENSE_ROWS + 1, 1), dtype=np.float32)
    with pytest.raises(ValueError, match="MAX_DENSE_ROWS"):
        make_vg_dense(xor_model(), x, y)


def _perturb_block(model, tiles, block, rng):
    """New tile list with the given node block's coordinates perturbed."""
    out = list(tiles)
    for p in model.par_block_indices(block):
        out[p] = out[p] + jnp.asarray(rng.normal(size=out[p].shape) * 0.1,
                                      jnp.float32)
    return out


def _check_incremental(model, x, y, C=32):
    from eeyore_tpu.ops.mlp_dense import make_incremental_gibbs_dense

    rng = np.random.default_rng(9)
    thetas = rng.normal(size=(C, model.num_params)).astype(np.float32)
    tiles = tiles_from(thetas)
    value = make_vg_dense(model, x, y, with_grad=False)
    _, init, updates = make_incremental_gibbs_dense(model, x, y)

    val0, cache = init(tiles)
    np.testing.assert_array_equal(np.asarray(val0), np.asarray(value(tiles)))

    for block in range(model.num_par_blocks()):
        l, j = model.layer_and_node_from_par_block(block)
        prop = _perturb_block(model, tiles, block, rng)
        v_inc, cache_p = updates[(l, j)](tuple(prop), cache)
        # incremental value == full forward at the proposed point, exactly
        np.testing.assert_array_equal(np.asarray(v_inc),
                                      np.asarray(value(tuple(prop))))
        # untouched cache entries are returned as the same objects
        assert any(new is old for new, old in zip(cache_p, cache)) or l == 0


def test_incremental_gibbs_dense_bce():
    _check_incremental(xor_model(), XOR_X, XOR_Y)


def test_incremental_gibbs_dense_ce():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 6)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]))
    _check_incremental(model, x, y)


def test_incremental_gibbs_dense_deep():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(5, 2)).astype(np.float32)
    y = (rng.random((5, 1)) > 0.5).astype(np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 3, 2, 1],
                                            activations=[mlp.sigmoid] * 3))
    _check_incremental(model, x, y)


def test_stack_unstack_roundtrip():
    thetas = RNG.normal(size=(48, 9)).astype(np.float32)
    dense = stack_chains(thetas)
    assert dense.shape == (9 * 8, 6)
    back = unstack_chains(dense, 9)
    np.testing.assert_array_equal(np.asarray(back), thetas)
    # and the tile view matches tiles_from
    tiles = tiles_from(thetas)
    np.testing.assert_array_equal(np.asarray(dense).reshape(9, 8, 6)[3], np.asarray(tiles[3]))
