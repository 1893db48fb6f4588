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


def check_value_only(model, x, y, C=64):
    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    v = make_vg(model, x_pad, y_pad, mask, loc, ivar, const, temp, with_grad=False)
    thetas = RNG.normal(size=(C, model.num_params)).astype(np.float32)
    vals = v(jnp.asarray(thetas.T), jnp.asarray(x_pad), jnp.asarray(y_pad),
             jnp.asarray(mask), jnp.asarray(loc), jnp.asarray(ivar))
    ref_v = jax.vmap(
        lambda t: model.log_target(t, jnp.asarray(x, jnp.float32),
                                   jnp.asarray(y, jnp.float32))
    )(jnp.asarray(thetas))
    np.testing.assert_allclose(np.asarray(vals[0]), np.asarray(ref_v), rtol=2e-5, atol=2e-4)


def test_value_only_bce_mlp221():
    x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
    y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    check_value_only(model, x, y)


def test_value_only_ce_mlp433():
    x = RNG.normal(size=(20, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 20)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]),
                dtype=jnp.float32)
    check_value_only(model, x, y)


def test_resident_mala_log_rate_algebra():
    """The resident MALA kernel drops the Normal log-density constants (they
    cancel between the forward and reverse terms) and rewrites
    ||prop - fwd_mean||^2 as step * ||z||^2. Pin that simplification against
    the scanned MALA's full expression (samplers/mala.py:59-71)."""
    import math

    step = 0.037
    P, C = 11, 5
    theta = RNG.normal(size=(P, C))
    grad = RNG.normal(size=(P, C))
    g_p = RNG.normal(size=(P, C))
    z = RNG.normal(size=(P, C))
    v, v_p = RNG.normal(size=(1, C)), RNG.normal(size=(1, C))

    fwd_mean = theta + 0.5 * step * grad
    prop = fwd_mean + math.sqrt(step) * z
    rev_mean = prop + 0.5 * step * g_p

    def logq(xx, loc):
        s = math.sqrt(step)
        zz = (xx - loc) / s
        return np.sum(-0.5 * zz * zz - math.log(s) - 0.5 * math.log(2 * math.pi),
                      axis=0, keepdims=True)

    full = v_p - v - logq(prop, fwd_mean) + logq(theta, rev_mean)

    d_rev = theta - rev_mean
    simplified = (v_p - v
                  - (0.5 / step) * np.sum(d_rev * d_rev, axis=0, keepdims=True)
                  + 0.5 * np.sum(z * z, axis=0, keepdims=True))
    np.testing.assert_allclose(simplified, full, rtol=1e-10, atol=1e-10)


def test_ce_mlp4323_mixed_bias():
    x = RNG.normal(size=(30, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 30)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 2, 3], bias=[True, False, True],
                                            activations=[mlp.sigmoid, mlp.sigmoid, None]),
                dtype=jnp.float32)
    check(model, x, y)


def test_model_matmuls_use_high_precision():
    """TPU lowers f32 matmuls to ONE bf16 MXU pass by default; that rounding
    drops iris HMC acceptance from the f64-oracle 0.97 to 0.89. The model
    forwards pin Precision.HIGH (3-pass bf16: same 0.9705 acceptance as
    HIGHEST, ~25% faster) — assert it survives into the lowered IR."""
    from eeyore_tpu.models import LogisticRegression, logistic_regression

    x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
    y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    theta = np.zeros(model.num_params, dtype=np.float32)
    text = jax.jit(model.log_target).lower(theta, x, y).as_text()
    assert "HIGH" in text.upper()

    lr = LogisticRegression(loss=loss_functions["binary_classification"],
                            hparams=logistic_regression.Hyperparameters(input_size=2))
    theta = np.zeros(lr.num_params, dtype=np.float32)
    text = jax.jit(lr.log_target).lower(theta, x, y).as_text()
    assert "HIGH" in text.upper()


def test_logistic_regression_path():
    """The chain-lane math also serves LogisticRegression (extract_arch's
    single-layer branch) — so the resident kernels cover the reference's
    banknotes logreg family too."""
    from eeyore_tpu.models import LogisticRegression, logistic_regression

    x = RNG.normal(size=(20, 6)).astype(np.float32)
    y = (RNG.random((20, 1)) > 0.5).astype(np.float32)
    lr = LogisticRegression(loss=loss_functions["binary_classification"],
                            hparams=logistic_regression.Hyperparameters(input_size=6))
    check(lr, x, y, C=16)
    check_value_only(lr, x, y, C=16)


def check_incremental(model, x, y, C=16, sweeps=3, seed=7):
    """Incremental Gibbs math must be BIT-IDENTICAL to the full value-only
    forward after any sequence of node-block updates (it reuses cached
    activations that the full pass would recompute from the same floats)."""
    from eeyore_tpu.ops.mlp_math import make_incremental_gibbs

    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    v_full = make_vg(model, x_pad, y_pad, mask, loc, ivar, const, temp,
                     with_grad=False)
    _, init, updates = make_incremental_gibbs(model, x_pad.shape[0], temp, const)
    args = (jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask),
            jnp.asarray(loc), jnp.asarray(ivar))

    rng = np.random.default_rng(seed)
    theta = jnp.asarray(rng.normal(size=(model.num_params, C)).astype(np.float32))
    val, cache = init(theta, *args)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(v_full(theta, *args)))

    num_blocks = model.num_par_blocks()
    for _ in range(sweeps):
        for b in range(num_blocks):
            indices = np.asarray(model.par_block_indices(b))
            l, j = model.layer_and_node_from_par_block(b)
            z = np.zeros((model.num_params, C), dtype=np.float32)
            z[indices] = rng.normal(size=(len(indices), C)).astype(np.float32)
            prop = theta + jnp.asarray(z)
            val_p, cache_p = updates[(l, j)](prop, *args, cache)
            np.testing.assert_array_equal(
                np.asarray(val_p), np.asarray(v_full(prop, *args)),
                err_msg=f"block {b} (layer {l}, node {j})")
            # identity-pass-through contract: only downstream entries move
            changed = sum(1 for old, new in zip(cache, cache_p) if new is not old)
            assert 0 < changed <= len(cache)
            # alternate accept/reject to exercise both cache branches
            if b % 2 == 0:
                theta, cache = prop, cache_p


def test_incremental_gibbs_bce_mlp221():
    x = np.array([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=np.float32)
    y = np.array([[0.], [1.], [1.], [0.]], dtype=np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 2, 1]), dtype=jnp.float32)
    check_incremental(model, x, y)


def test_incremental_gibbs_ce_mlp433():
    x = RNG.normal(size=(20, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 20)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]),
                dtype=jnp.float32)
    check_incremental(model, x, y)


def test_incremental_gibbs_ce_mlp4323_mixed_bias():
    x = RNG.normal(size=(30, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 30)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 2, 3], bias=[True, False, True],
                                            activations=[mlp.sigmoid, mlp.sigmoid, None]),
                dtype=jnp.float32)
    check_incremental(model, x, y)


def test_incremental_gibbs_bce_mlp2321():
    x = RNG.normal(size=(12, 2)).astype(np.float32)
    y = (RNG.uniform(size=(12, 1)) > 0.5).astype(np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 3, 2, 1]), dtype=jnp.float32)
    check_incremental(model, x, y)


def test_split_vg_matches_combined():
    """make_vg(split=True) returns (ll, lp, gll, glp) whose beta-combination
    reproduces the tempered value/gradient: lp + b*ll == log_target at
    likelihood-temperature b; combined==split at b=1 exactly."""
    x = RNG.normal(size=(20, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 20)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]),
                dtype=jnp.float32)
    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    args = (jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask),
            jnp.asarray(loc), jnp.asarray(ivar))
    v_comb = make_vg(model, x_pad, y_pad, mask, loc, ivar, const, temp)
    v_split = make_vg(model, x_pad, y_pad, mask, loc, ivar, const, temp, split=True)
    v_split_val = make_vg(model, x_pad, y_pad, mask, loc, ivar, const, temp,
                          with_grad=False, split=True)

    theta = jnp.asarray(RNG.normal(size=(model.num_params, 32)).astype(np.float32))
    val, grad = v_comb(theta, *args)
    ll, lp, gll, glp = v_split(theta, *args)
    np.testing.assert_array_equal(np.asarray(ll + lp), np.asarray(val))
    np.testing.assert_allclose(np.asarray(gll + glp), np.asarray(grad),
                               rtol=1e-6, atol=1e-6)
    ll_v, lp_v = v_split_val(theta, *args)
    np.testing.assert_array_equal(np.asarray(ll_v), np.asarray(ll))
    np.testing.assert_array_equal(np.asarray(lp_v), np.asarray(lp))

    # beta-combination equals the likelihood-tempered target from the model
    beta = 0.37
    want = jax.vmap(lambda t: model.log_prior(t) + beta * model.log_lik(
        t, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))(theta.T)
    np.testing.assert_allclose(np.asarray((lp + beta * ll)[0]), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def check_stream(model, x, y, C=32, with_grad=True, split=False):
    from eeyore_tpu.ops.mlp_math import make_vg_stream

    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    args = lambda: (jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask),
                    jnp.asarray(loc), jnp.asarray(ivar))
    base = make_vg(model, x_pad, y_pad, mask, loc, ivar, const, temp,
                   with_grad=with_grad, split=split)
    strm = make_vg_stream(model, x_pad, y_pad, mask, loc, ivar, const, temp,
                          with_grad=with_grad, split=split)
    thetas = RNG.normal(size=(C, model.num_params)).astype(np.float32)
    out_b = base(jnp.asarray(thetas.T), *args())
    out_s = strm(jnp.asarray(thetas.T), *args())
    if not isinstance(out_b, tuple):
        out_b, out_s = (out_b,), (out_s,)
    for b, s in zip(out_b, out_s):
        np.testing.assert_allclose(np.asarray(s), np.asarray(b), rtol=2e-5, atol=2e-4)


def test_stream_matches_vg_ce_iris_shape():
    """The row-streaming schedule (chunked forward+backward, partial-sum
    accumulators) must agree with the materialize-everything schedule on an
    iris-shaped CE problem — value, gradient, value-only and split forms."""
    x = RNG.normal(size=(150, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 150)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]),
                dtype=jnp.float32)
    check_stream(model, x, y)
    check_stream(model, x, y, with_grad=False)
    check_stream(model, x, y, split=True)
    check_stream(model, x, y, with_grad=False, split=True)


def test_stream_matches_vg_bce_deep():
    """BCE + a deeper MLP with a row count that is not a chunk multiple of
    the raw data (padding rows must stay masked out mid-stream)."""
    x = RNG.normal(size=(37, 2)).astype(np.float32)
    y = (RNG.random((37, 1)) > 0.5).astype(np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[2, 3, 2, 1]), dtype=jnp.float32)
    check_stream(model, x, y)
    check_stream(model, x, y, with_grad=False)


def test_stream_matches_value_and_grad():
    """End-to-end oracle: streaming vg against jax.value_and_grad of the
    model log-target (same oracle as the base schedule's check())."""
    x = RNG.normal(size=(64, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 64)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]),
                dtype=jnp.float32)
    from eeyore_tpu.ops.mlp_math import make_vg_stream

    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    vg = make_vg_stream(model, x_pad, y_pad, mask, loc, ivar, const, temp)
    thetas = RNG.normal(size=(32, model.num_params)).astype(np.float32)
    vals, grads = vg(jnp.asarray(thetas.T), jnp.asarray(x_pad), jnp.asarray(y_pad),
                     jnp.asarray(mask), jnp.asarray(loc), jnp.asarray(ivar))
    ref_v, ref_g = jax.vmap(
        lambda t: jax.value_and_grad(model.log_target)(
            t, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    )(jnp.asarray(thetas))
    np.testing.assert_allclose(np.asarray(vals[0]), np.asarray(ref_v), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grads.T), np.asarray(ref_g), rtol=2e-5, atol=2e-4)


def check_stream_mxu(model, x, y, C=32, with_grad=True):
    from eeyore_tpu.ops.mlp_math import make_vg_stream

    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    args = (jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask),
            jnp.asarray(loc), jnp.asarray(ivar))
    base = make_vg_stream(model, x_pad, y_pad, mask, loc, ivar, const, temp,
                          with_grad=with_grad)
    mxu = make_vg_stream(model, x_pad, y_pad, mask, loc, ivar, const, temp,
                         with_grad=with_grad, mxu_layer0=True)
    thetas = RNG.normal(size=(C, model.num_params)).astype(np.float32)
    out_b = base(jnp.asarray(thetas.T), *args)
    out_m = mxu(jnp.asarray(thetas.T), *args)
    if not isinstance(out_b, tuple):
        out_b, out_m = (out_b,), (out_m,)
    for b, m in zip(out_b, out_m):
        np.testing.assert_allclose(np.asarray(m), np.asarray(b), rtol=2e-5, atol=2e-4)


def test_stream_mxu_layer0_matches():
    """The MXU layer-0 panels (Z0 = X_aug @ W0_aug forward, G0 = X_aug^T @ D
    backward) must reproduce the per-unit VPU schedule — CE iris shape,
    BCE deep net, a bias-less first layer, and a single-layer model
    (logistic regression: layer 0 IS the output layer)."""
    x = RNG.normal(size=(150, 4)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, 150)]
    model = MLP(loss=loss_functions["multiclass_classification"],
                hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                            activations=[mlp.sigmoid, None]),
                dtype=jnp.float32)
    check_stream_mxu(model, x, y)
    check_stream_mxu(model, x, y, with_grad=False)

    xb = RNG.normal(size=(40, 3)).astype(np.float32)
    yb = (RNG.random((40, 1)) > 0.5).astype(np.float32)
    deep = MLP(loss=loss_functions["binary_classification"],
               hparams=mlp.Hyperparameters(dims=[3, 4, 2, 1]), dtype=jnp.float32)
    check_stream_mxu(deep, xb, yb)

    nobias = MLP(loss=loss_functions["binary_classification"],
                 hparams=mlp.Hyperparameters(dims=[3, 3, 1], bias=[False, True]),
                 dtype=jnp.float32)
    check_stream_mxu(nobias, xb, yb)

    from eeyore_tpu.models import LogisticRegression
    from eeyore_tpu.models import logistic_regression as lr_mod

    lr = LogisticRegression(
        loss=loss_functions["binary_classification"],
        hparams=lr_mod.Hyperparameters(input_size=3), dtype=jnp.float32)
    check_stream_mxu(lr, xb, yb)


def test_stream_mxu_bf16_3pass_near_f32():
    """The manual hi/lo bf16 3-pass matmul split (matmul_precision=
    'bf16_3pass') must track the HIGHEST schedule to ~f32 round-off —
    orders of magnitude tighter than a single bf16 pass ('default'),
    at half HIGHEST's MXU cost."""
    from eeyore_tpu.ops.mlp_math import make_vg_stream

    x = RNG.normal(size=(64, 64)).astype(np.float32)
    y = (RNG.random((64, 1)) > 0.5).astype(np.float32)
    model = MLP(loss=loss_functions["binary_classification"],
                hparams=mlp.Hyperparameters(dims=[64, 4, 1]),
                dtype=jnp.float32)
    x_pad, y_pad, mask, loc, ivar, const, temp = prepare_data(model, x, y)
    args = (jnp.asarray(x_pad), jnp.asarray(y_pad), jnp.asarray(mask),
            jnp.asarray(loc), jnp.asarray(ivar))
    thetas = RNG.normal(size=(32, model.num_params)).astype(np.float32)

    outs = {}
    for mode in ("highest", "bf16_3pass"):
        vg = make_vg_stream(model, x_pad, y_pad, mask, loc, ivar, const,
                            temp, mxu_layer0=True, matmul_precision=mode)
        outs[mode] = vg(jnp.asarray(thetas.T), *args)

    def max_rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b) / (np.abs(b) + 1.0)))

    # the hi/lo casts run on every platform (unlike the Precision hint,
    # which CPU ignores): dropped lo@lo term + per-pass rounding over the
    # K=265 contraction is ~1e-4 relative, vs ~1e-2 for a single bf16 pass
    # (TPU-measured; benchmarks/probe_wide_mxu.py records both)
    for ai, bi in zip(outs["bf16_3pass"], outs["highest"]):
        err = max_rel(ai, bi)
        assert 0.0 < err < 3e-4  # > 0: the split genuinely rounded

    with np.testing.assert_raises(ValueError):
        make_vg_stream(model, x_pad, y_pad, mask, loc, ivar, const, temp,
                       matmul_precision="nope")
