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
            temperature, with_grad=True, split=False):
    """Build vg(theta [P, C], x, y, mask, loc, ivar) -> (val [1,C], grad [P,C]).

    x/y/mask/loc/ivar are passed per call so the same function body works on
    VMEM refs sliced to arrays inside a kernel or on plain jnp arrays.

    With ``with_grad=False`` the backward pass is skipped entirely and the
    returned function yields only ``val [1, C]`` — the random-walk MH path
    (reference metropolis_hastings.py:44-54 needs no gradient).

    With ``split=True`` the log-likelihood and log-prior are returned
    SEPARATELY (untempered): ``(ll, lp, gll, glp)`` with grads [P, C] (or
    ``(ll, lp)`` value-only) — the likelihood-tempered SMC path
    (samplers/smc.py: pi_beta ~ prior * lik^beta) combines them with a
    runtime beta: val = lp + beta*ll, grad = glp + beta*gll.
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
            return (log_lik, log_prior) if split else val

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

        grad = jnp.concatenate(grad_rows, axis=0)  # [P, C] d(log_lik)/d(theta)
        if split:
            return log_lik, log_prior, grad, -diff * ivar
        grad = temperature * (grad - diff * ivar)
        return val, grad

    return vg


def make_vg_stream(model, x_pad, y_pad, row_mask, prior_loc, prior_inv_var,
                   prior_const, temperature, with_grad=True, split=False,
                   chunk_rows=8, mxu_layer0=False, matmul_precision="highest"):
    """Row-streaming variant of ``make_vg`` for medium/large datasets.

    Same contract and signature as ``make_vg``, different schedule: instead
    of materializing every intermediate as a full [n_pad, C] array (for
    iris-sized data that is ~20 live [152, C] buffers — past the Mosaic
    VMEM budget at useful chain blocks, so the resident kernels spill),
    the data rows are processed in ``chunk_rows``-row chunks with forward
    AND backward fused per chunk. Cross-chunk state is only:

    - a [chunk_rows, C] log-lik partial accumulator, and
    - one [chunk_rows, C] partial-sum tile per parameter gradient,

    reduced over sublanes ONCE at the end (the per-chunk reductions the
    naive schedule would do are pure overhead — partial sums are
    associative). Live VMEM is O(P + chunk_rows) tiles instead of
    O(n_pad) — measured on the iris resident HMC kernel this removes the
    spill regime entirely (benchmarks/PROBE_IRIS.json: cb512 > cb1024
    throughput inversion).

    Accumulation order differs from ``make_vg`` (chunk-major), so values
    match to float32 round-off, not bitwise.

    ``mxu_layer0=True`` moves layer 0 — the only layer whose contractions
    share an operand (the data matrix) across chains — onto the MXU, via
    per-node lane-selector matrices (Mosaic cannot concatenate sublane-
    misaligned theta rows into a weight panel, so instead the data columns
    are placed AT the flat parameter indices):

    - ``xmat_j [n_pad, P]`` holds data column i at lane ``w(0,j,i)`` (and
      1.0 at lane ``b(0,j)``) — built once per kernel invocation from iota
      masks (``vg.make_premul``), loop-invariant across leapfrog steps;
    - forward: ``Z0_j = xmat_j @ theta`` (one dot per node, k contracting
      over all P rows — the MXU pads k to 128 either way);
    - backward: hidden deltas are staged per chunk and contracted as
      ``G0 = sum_j xmat_j^T @ D_j`` — a [P, C] result whose nonzero rows
      are exactly the layer-0 parameters, added to the gradient directly.

    ``matmul_precision``: 'highest' (full f32 accuracy, XLA's 6-bf16-pass
    schedule, default), 'bf16_3pass' (manual hi/lo split: a = hi + lo with
    hi = bf16(a), product = hi@hi + hi@lo + lo@hi — drops only the
    lo@lo ~2^-16-relative term, so ~f32 accuracy at HALF the HIGHEST
    cost), or 'default' (single bf16 pass — fast but rounds inputs to 8
    mantissa bits; validate acceptance before using).
    """
    dims, bias, loss_kind, layer_offsets = extract_arch(model)
    num_layers = len(dims) - 1
    n_pad = x_pad.shape[0]
    P = model.num_params
    if n_pad % chunk_rows:
        raise ValueError(f"n_pad {n_pad} not a multiple of chunk_rows {chunk_rows}")
    if matmul_precision not in ("highest", "bf16_3pass", "default"):
        raise ValueError(f"matmul_precision must be 'highest', 'bf16_3pass' "
                         f"or 'default', got {matmul_precision!r}")
    if matmul_precision == "bf16_3pass":
        def mm(a, b, contract):
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def d(u, v):
                return jax.lax.dot_general(
                    u, v, (contract, ((), ())),
                    preferred_element_type=jnp.float32)

            return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    else:
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "default": jax.lax.Precision.DEFAULT}[matmul_precision]

        def mm(a, b, contract):
            return jax.lax.dot_general(a, b, (contract, ((), ())),
                                       precision=prec)
    if mxu_layer0:
        k1 = dims[1]
        w_off0, b_off0 = layer_offsets[0]

    def make_premul(x):
        """The k1 lane-selector matrices for the layer-0 MXU path; build
        once per kernel call (they depend only on the data)."""
        lanes = jax.lax.broadcasted_iota(jnp.int32, (n_pad, P), 1)
        xmats = []
        for j in range(k1):
            m = jnp.zeros((n_pad, P), jnp.float32)
            for i in range(dims[0]):
                m = jnp.where(lanes == w_off0 + j * dims[0] + i, x[:, i:i + 1], m)
            if bias[0]:
                m = jnp.where(lanes == b_off0 + j, 1.0, m)
            xmats.append(m)
        return tuple(xmats)

    def vg(theta, x, y, mask, loc, ivar, premul=None):
        C = theta.shape[1]

        def w_row(l, j, i):
            w_off, _ = layer_offsets[l]
            return theta[w_off + j * dims[l] + i, :][None, :]

        def b_row(l, j):
            _, b_off = layer_offsets[l]
            return theta[b_off + j, :][None, :]

        k_out = dims[-1]
        ll_part = jnp.zeros((chunk_rows, C), dtype=jnp.float32)
        g_part = [None] * P if with_grad else None

        def g_add(p, term):
            g_part[p] = term if g_part[p] is None else g_part[p] + term

        if mxu_layer0:
            xmats = premul if premul is not None else make_premul(x)
            z0_cols = [mm(xm, theta, ((1,), (0,)))
                       for xm in xmats]                   # k1 x [n_pad, C]
            delta0_store = [[] for _ in range(k1)]

        # static per-chunk mask knowledge: chunks fully inside the real data
        # need no mask multiplications at all (row_mask is a BUILD-time numpy
        # array; only the tail chunk of a padded dataset is partial)
        np_mask = np.asarray(row_mask).reshape(-1)

        for c0 in range(0, n_pad, chunk_rows):
            xc = x[c0:c0 + chunk_rows]
            yc = y[c0:c0 + chunk_rows]
            full = bool(np.all(np_mask[c0:c0 + chunk_rows] == 1.0))
            mc = None if full else mask[c0:c0 + chunk_rows]

            def masked(v):
                return v if mc is None else v * mc

            h = [xc[:, i][:, None] for i in range(dims[0])]
            acts = [h]
            zs = []
            for l in range(num_layers):
                if l == 0 and mxu_layer0:
                    z_l = [z0_cols[j][c0:c0 + chunk_rows] for j in range(dims[1])]
                else:
                    z_l = []
                    for j in range(dims[l + 1]):
                        z = None
                        for i in range(dims[l]):
                            term = acts[l][i] * w_row(l, j, i)
                            z = term if z is None else z + term
                        if bias[l]:
                            z = b_row(l, j) if z is None else z + b_row(l, j)
                        z_l.append(jnp.broadcast_to(z, (chunk_rows, C)))
                zs.append(z_l)
                if l < num_layers - 1 or loss_kind == "bce":
                    acts.append([jax.nn.sigmoid(z) for z in z_l])
                else:
                    acts.append(z_l)

            if loss_kind == "bce":
                deltas = []
                for j in range(k_out):
                    z = zs[-1][j]
                    yj = yc[:, j][:, None]
                    ll_part = ll_part + masked(yj * z - jax.nn.softplus(z))
                    if with_grad:
                        deltas.append(masked(yj - acts[-1][j]))
            else:
                zmax = zs[-1][0]
                for j in range(1, k_out):
                    zmax = jnp.maximum(zmax, zs[-1][j])
                exps = [jnp.exp(z - zmax) for z in zs[-1]]
                sumexp = exps[0]
                for e in exps[1:]:
                    sumexp = sumexp + e
                lse = zmax + jnp.log(sumexp)
                picked = None
                for j in range(k_out):
                    term = yc[:, j][:, None] * zs[-1][j]
                    picked = term if picked is None else picked + term
                ll_part = ll_part + masked(picked - lse)
                if with_grad:
                    # softmax_j = exps[j] / sumexp reuses the loss's exps —
                    # one reciprocal instead of k_out fresh exp calls
                    inv = 1.0 / sumexp
                    deltas = [masked(yc[:, j][:, None] - exps[j] * inv)
                              for j in range(k_out)]

            if not with_grad:
                continue

            for l in reversed(range(num_layers)):
                if l == 0 and mxu_layer0:
                    # stage this chunk's layer-0 deltas; ONE matmul against
                    # the selector panels after the loop replaces all
                    # per-param work
                    for j in range(dims[1]):
                        delta0_store[j].append(deltas[j])
                    break
                w_off, b_off = layer_offsets[l]
                for j in range(dims[l + 1]):
                    for i in range(dims[l]):
                        g_add(w_off + j * dims[l] + i, deltas[j] * acts[l][i])
                    if bias[l]:
                        g_add(b_off + j, deltas[j])
                if l > 0:
                    new_deltas = []
                    for i in range(dims[l]):
                        s = None
                        for j in range(dims[l + 1]):
                            term = deltas[j] * w_row(l, j, i)
                            s = term if s is None else s + term
                        a = acts[l][i]
                        new_deltas.append(s * (a * (1.0 - a)))
                    deltas = new_deltas

        log_lik = jnp.sum(ll_part, axis=0, keepdims=True)

        diff = theta - loc
        log_prior = jnp.sum(-0.5 * diff * diff * ivar, axis=0,
                            keepdims=True) + prior_const
        val = temperature * (log_lik + log_prior)
        if not with_grad:
            return (log_lik, log_prior) if split else val

        grad_rows = [None if g is None else jnp.sum(g, axis=0, keepdims=True)
                     for g in g_part]
        if mxu_layer0:
            # G0[p, c] = sum_j sum_d xmat_j[d, p] D_j[d, c]: nonzero exactly
            # at the layer-0 parameter rows; everything else contributes 0,
            # so it adds straight into the stacked gradient
            g0 = None
            zero_row = jnp.zeros((1, C), dtype=jnp.float32)
            for j in range(k1):
                dj = jnp.concatenate(delta0_store[j], axis=0)  # [n_pad, C]
                term = mm(xmats[j], dj, ((0,), (0,)))
                g0 = term if g0 is None else g0 + term
            for j in range(k1):
                for i in range(dims[0]):
                    grad_rows[w_off0 + j * dims[0] + i] = zero_row
                if bias[0]:
                    grad_rows[b_off0 + j] = zero_row
        grad = jnp.concatenate(grad_rows, axis=0)  # [P, C] d(log_lik)/d(theta)
        if mxu_layer0:
            grad = grad + g0
        if split:
            return log_lik, log_prior, grad, -diff * ivar
        grad = temperature * (grad - diff * ivar)
        return val, grad

    vg.make_premul = make_premul if mxu_layer0 else None
    return vg


def make_incremental_gibbs(model, n_pad, temperature, prior_const):
    """Incremental log-posterior evaluation for blocked Gibbs sweeps.

    A Gibbs node-block proposal (reference gibbs.py:73-94 semantics) perturbs
    only the incoming weights/bias of ONE unit (layer l, node j), so only that
    unit's activation and everything downstream changes. This builds:

    - ``cache_keys``: static tuple naming the cached arrays — hidden
      activations ``('a', l, j)`` ([n_pad, C], unit j of weight-layer l's
      output) and, per loss, output-unit log-lik contributions ``('ll', j)``
      ([1, C], BCE) or output logits ``('z', j)`` ([n_pad, C], CE).
    - ``init(theta, x, y, mask, loc, ivar) -> (val, cache)``: full forward.
    - ``updates[(l, j)](theta, x, y, mask, loc, ivar, cache) ->
      (val, new_cache)``: recompute unit (l, j) from cached upstream
      activations, then all layers strictly downstream; UNCHANGED cache
      entries are returned as the very same objects, so callers can
      where-select only what moved.

    The incremental value is bit-identical to the full forward: cached
    activations are the same floats the full pass would recompute, and the
    log-lik reductions run in the same order.
    """
    dims, bias, loss_kind, layer_offsets = extract_arch(model)
    num_layers = len(dims) - 1
    k_out = dims[-1]

    cache_keys = tuple(
        ("a", l, j)
        for l in range(num_layers - 1)
        for j in range(dims[l + 1])
    ) + tuple(
        ("ll" if loss_kind == "bce" else "z", j) for j in range(k_out)
    )
    key_pos = {k: i for i, k in enumerate(cache_keys)}

    def w_row(theta, l, j, i):
        w_off, _ = layer_offsets[l]
        return theta[w_off + j * dims[l] + i, :][None, :]

    def b_row(theta, l, j):
        _, b_off = layer_offsets[l]
        return theta[b_off + j, :][None, :]

    def unit_z(theta, prev, l, j):
        C = theta.shape[1]
        z = jnp.zeros((n_pad, C), dtype=jnp.float32)
        for i in range(dims[l]):
            z = z + prev[i] * w_row(theta, l, j, i)
        if bias[l]:
            z = z + b_row(theta, l, j)
        return z

    def layer_inputs(theta, x, cache, l):
        if l == 0:
            return [x[:, i][:, None] for i in range(dims[0])]
        return [cache[key_pos[("a", l - 1, i)]] for i in range(dims[l])]

    def bce_unit_ll(z, y, mask, j):
        yj = y[:, j][:, None]
        return jnp.sum((yj * z - jax.nn.softplus(z)) * mask, axis=0, keepdims=True)

    def ce_ll(zs, y, mask):
        zmax = zs[0]
        for j in range(1, k_out):
            zmax = jnp.maximum(zmax, zs[j])
        sumexp = jnp.zeros_like(zs[0])
        for j in range(k_out):
            sumexp = sumexp + jnp.exp(zs[j] - zmax)
        lse = zmax + jnp.log(sumexp)
        picked = jnp.zeros_like(zs[0])
        for j in range(k_out):
            picked = picked + y[:, j][:, None] * zs[j]
        return jnp.sum((picked - lse) * mask, axis=0, keepdims=True)

    def log_lik_from_cache(cache):
        # BCE only; the CE path computes ll directly from the cached logits.
        ll = cache[key_pos[("ll", 0)]]
        for j in range(1, k_out):
            ll = ll + cache[key_pos[("ll", j)]]
        return ll

    def log_prior(theta, loc, ivar):
        diff = theta - loc
        return jnp.sum(-0.5 * diff * diff * ivar, axis=0, keepdims=True) + prior_const

    def finish(theta, loc, ivar, ll):
        return temperature * (ll + log_prior(theta, loc, ivar))

    def init(theta, x, y, mask, loc, ivar):
        cache = [None] * len(cache_keys)
        for l in range(num_layers - 1):
            prev = layer_inputs(theta, x, cache, l)
            for j in range(dims[l + 1]):
                cache[key_pos[("a", l, j)]] = jax.nn.sigmoid(unit_z(theta, prev, l, j))
        prev = layer_inputs(theta, x, cache, num_layers - 1)
        zs = [unit_z(theta, prev, num_layers - 1, j) for j in range(k_out)]
        if loss_kind == "bce":
            for j in range(k_out):
                cache[key_pos[("ll", j)]] = bce_unit_ll(zs[j], y, mask, j)
            ll = log_lik_from_cache(cache)
        else:
            for j in range(k_out):
                cache[key_pos[("z", j)]] = zs[j]
            ll = ce_ll(zs, y, mask)
        return finish(theta, loc, ivar, ll), tuple(cache)

    def make_update(l, j):
        if l == num_layers - 1:
            def update(theta, x, y, mask, loc, ivar, cache):
                cache = list(cache)
                prev = layer_inputs(theta, x, cache, l)
                z = unit_z(theta, prev, l, j)
                if loss_kind == "bce":
                    cache[key_pos[("ll", j)]] = bce_unit_ll(z, y, mask, j)
                    ll = log_lik_from_cache(cache)
                else:
                    cache[key_pos[("z", j)]] = z
                    ll = ce_ll([cache[key_pos[("z", jj)]] for jj in range(k_out)], y, mask)
                return finish(theta, loc, ivar, ll), tuple(cache)
            return update

        def update(theta, x, y, mask, loc, ivar, cache):
            cache = list(cache)
            prev = layer_inputs(theta, x, cache, l)
            cache[key_pos[("a", l, j)]] = jax.nn.sigmoid(unit_z(theta, prev, l, j))
            for dl in range(l + 1, num_layers - 1):
                prev = layer_inputs(theta, x, cache, dl)
                for dj in range(dims[dl + 1]):
                    cache[key_pos[("a", dl, dj)]] = jax.nn.sigmoid(unit_z(theta, prev, dl, dj))
            prev = layer_inputs(theta, x, cache, num_layers - 1)
            zs = [unit_z(theta, prev, num_layers - 1, jj) for jj in range(k_out)]
            if loss_kind == "bce":
                for jj in range(k_out):
                    cache[key_pos[("ll", jj)]] = bce_unit_ll(zs[jj], y, mask, jj)
                ll = log_lik_from_cache(cache)
            else:
                for jj in range(k_out):
                    cache[key_pos[("z", jj)]] = zs[jj]
                ll = ce_ll(zs, y, mask)
            return finish(theta, loc, ivar, ll), tuple(cache)
        return update

    updates = {}
    for l in range(num_layers):
        for j in range(dims[l + 1]):
            updates[(l, j)] = make_update(l, j)
    return cache_keys, init, updates
