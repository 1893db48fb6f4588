"""The shared chain-lane MLP math (ops/mlp_math.py) — used by both Pallas
kernels — validated as plain traced jnp code against jax.value_and_grad.
(The resident kernel itself needs real TPU hardware: the on-core PRNG has no
CPU lowering; its statistics are validated on-device in benchmarks/.)"""

import numpy as np
import jax
import jax.numpy as jnp

from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.ops.mlp_math import make_vg, prepare_data

RNG = np.random.default_rng(123)


def check(model, x, y, C=64):
    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    vg = make_vg(model, x_pad, y_pad, mask, loc, ivar, const, temp)
    thetas = RNG.normal(size=(C, model.num_params)).astype(np.float32)
    vals, grads = vg(jnp.asarray(thetas.T), jnp.asarray(x_pad), jnp.asarray(y_pad),
                     jnp.asarray(mask), jnp.asarray(loc), jnp.asarray(ivar))
    ref_v, ref_g = jax.vmap(
        lambda t: jax.value_and_grad(model.log_target)(
            t, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    )(jnp.asarray(thetas))
    np.testing.assert_allclose(np.asarray(vals[0]), np.asarray(ref_v), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grads.T), np.asarray(ref_g), rtol=2e-5, atol=2e-4)


def test_bce_mlp221():
    x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
    y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    check(model, x, y)


def test_ce_mlp4323_mixed_bias():
    x = RNG.normal(size=(30, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 30)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 2, 3], bias=[True, False, True],
                                            activations=[mlp.sigmoid, mlp.sigmoid, None]),
                dtype=jnp.float32)
    check(model, x, y)
