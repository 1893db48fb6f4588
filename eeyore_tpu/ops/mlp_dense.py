"""Dense chain-tile MLP log-posterior math for tiny datasets.

Layout contrast with ops/mlp_math.py (data points on sublanes, chains on
lanes): here chains fill BOTH the sublane and lane axes — every scalar model
parameter is its own [8, C] tile holding that parameter for 8*C chains — and
the data loop is unrolled in Python with x/y/mask folded in as compile-time
constants. For n-row datasets smaller than the 8-row sublane tile this wins
twice over the mlp_math layout:

- no padded sublane rows: an XOR-sized batch (4 rows padded to 8) wastes half
  of every forward/backward tile op in the data-on-sublanes layout; here all
  1024 lanes of every op are live chains;
- parameter-space ops (prior, leapfrog updates, momentum draws) are exact:
  a [P, C] array with P=9 physically occupies 16 sublane rows (1.8x waste),
  while P separate [8, C] tiles have none.

Zero-valued inputs (XOR!) drop their weight terms entirely and unit inputs
become adds. The backward pass is the same hand derivation as mlp_math
(reference semantics: log posterior = temperature * (log_lik + log_prior),
/root/reference/eeyore/models/bayesian_model.py:30-56).

Program size grows linearly with the number of data rows, so this path is
gated to small n (use mlp_math above ``MAX_DENSE_ROWS``).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.ops.mlp_math import extract_arch

MAX_DENSE_ROWS = 32


def prepare_dense(model, x, y):
    """Static per-model constants for the dense layout: data as python
    floats (folded into the unrolled program), prior moments per parameter."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.shape[0] > MAX_DENSE_ROWS:
        raise ValueError(
            f"dense chain-tile layout unrolls the data loop; {x.shape[0]} rows "
            f"> MAX_DENSE_ROWS={MAX_DENSE_ROWS} (use ops/mlp_math.py)")
    P = model.num_params
    loc = np.asarray(model.prior.loc, dtype=np.float64).reshape(P)
    ivar = 1.0 / np.asarray(model.prior.scale, dtype=np.float64).reshape(P) ** 2
    prior_const = float(np.sum(
        -np.log(np.asarray(model.prior.scale, dtype=np.float64))
        - 0.5 * math.log(2.0 * math.pi)))
    temperature = 1.0 if model.temperature is None else float(model.temperature)
    return x, y, loc, ivar, prior_const, temperature


def make_vg_dense(model, x, y, with_grad=True):
    """Build ``vg(theta) -> (val [8, C], grad list-of-P [8, C])`` where
    ``theta`` is a list of P [8, C] tiles (one per scalar parameter).

    With ``with_grad=False`` returns only ``val`` (the MH path)."""
    dims, bias, loss_kind, layer_offsets = extract_arch(model)
    x, y, loc, ivar, prior_const, temperature = prepare_dense(model, x, y)
    n = x.shape[0]
    num_layers = len(dims) - 1
    k_out = dims[-1]
    P = model.num_params
    temp = float(temperature)

    def w_idx(l, j, i):
        w_off, _ = layer_offsets[l]
        return w_off + j * dims[l] + i

    def b_idx(l, j):
        _, b_off = layer_offsets[l]
        return b_off + j

    def vg(theta):
        zeros = jnp.zeros_like(theta[0])

        def fma_const(acc, c, tile):
            """acc + c * tile with the constant folded (c is a python float)."""
            if c == 0.0:
                return acc
            if c == 1.0:
                return tile if acc is None else acc + tile
            scaled = np.float32(c) * tile
            return scaled if acc is None else acc + scaled

        log_lik = None
        # grad accumulators for the data term only (prior added at the end)
        g = [None] * P if with_grad else None

        def g_add(p, term):
            g[p] = term if g[p] is None else g[p] + term

        for d in range(n):
            # ---- forward, x[d]/y[d] folded as constants ----
            acts = []  # hidden activations per layer, list of [8, C] tiles
            prev_const = [float(v) for v in x[d]]  # layer-0 inputs are constants
            zs_out = []
            for l in range(num_layers):
                z_l = []
                for j in range(dims[l + 1]):
                    acc = theta[b_idx(l, j)] if bias[l] else None
                    if l == 0:
                        for i in range(dims[0]):
                            c = prev_const[i]
                            if c == 0.0:
                                continue
                            term = theta[w_idx(0, j, i)]
                            if c != 1.0:
                                term = np.float32(c) * term
                            acc = term if acc is None else acc + term
                    else:
                        for i in range(dims[l]):
                            term = acts[l - 1][i] * theta[w_idx(l, j, i)]
                            acc = term if acc is None else acc + term
                    z_l.append(zeros if acc is None else acc)
                if l < num_layers - 1:
                    acts.append([jax.nn.sigmoid(z) for z in z_l])
                zs_out = z_l

            # ---- loss at this point + output deltas ----
            if loss_kind == "bce":
                deltas = []
                for j in range(k_out):
                    z = zs_out[j]
                    yv = float(y[d, j])
                    ll_j = fma_const(None, yv, z)
                    # softplus and sigmoid share one exp(-|z|) — both stable
                    # forms need exactly that quantity:
                    #   softplus(z) = max(z, 0) + log1p(e)
                    #   sigmoid(z)  = 1/(1+e) if z >= 0 else e/(1+e)
                    e = jnp.exp(-jnp.abs(z))
                    sp = jnp.maximum(z, 0.0) + jnp.log1p(e)
                    ll_j = -sp if ll_j is None else ll_j - sp
                    log_lik = ll_j if log_lik is None else log_lik + ll_j
                    if with_grad:
                        inv = 1.0 / (1.0 + e)
                        sig = jnp.where(z >= 0, inv, e * inv)
                        deltas.append(np.float32(yv) - sig)
            else:
                zmax = zs_out[0]
                for j in range(1, k_out):
                    zmax = jnp.maximum(zmax, zs_out[j])
                sumexp = None
                for j in range(k_out):
                    e = jnp.exp(zs_out[j] - zmax)
                    sumexp = e if sumexp is None else sumexp + e
                lse = zmax + jnp.log(sumexp)
                picked = None
                for j in range(k_out):
                    picked = fma_const(picked, float(y[d, j]), zs_out[j])
                ll_d = (picked if picked is not None else zeros) - lse
                log_lik = ll_d if log_lik is None else log_lik + ll_d
                if with_grad:
                    deltas = [np.float32(float(y[d, j])) - jnp.exp(zs_out[j] - lse)
                              for j in range(k_out)]

            if not with_grad:
                continue

            # ---- backward for this point ----
            for l in reversed(range(num_layers)):
                for j in range(dims[l + 1]):
                    if l == 0:
                        for i in range(dims[0]):
                            c = prev_const[i]
                            if c == 0.0:
                                continue
                            term = deltas[j] if c == 1.0 else np.float32(c) * deltas[j]
                            g_add(w_idx(0, j, i), term)
                    else:
                        for i in range(dims[l]):
                            g_add(w_idx(l, j, i), deltas[j] * acts[l - 1][i])
                    if bias[l]:
                        g_add(b_idx(l, j), deltas[j])
                if l > 0:
                    new_deltas = []
                    for i in range(dims[l]):
                        s = None
                        for j in range(dims[l + 1]):
                            term = deltas[j] * theta[w_idx(l, j, i)]
                            s = term if s is None else s + term
                        a = acts[l - 1][i]
                        new_deltas.append(s * (a * (1.0 - a)))
                    deltas = new_deltas

        # ---- prior (per-parameter scalar constants) ----
        val = log_lik if log_lik is not None else zeros
        lp = np.float32(prior_const)
        for p in range(P):
            diff = theta[p] - np.float32(loc[p]) if loc[p] != 0.0 else theta[p]
            val = val - (np.float32(0.5 * ivar[p]) * diff) * diff
        val = (val + lp) if temp == 1.0 else np.float32(temp) * (val + lp)

        if not with_grad:
            return val

        grads = []
        for p in range(P):
            diff = theta[p] - np.float32(loc[p]) if loc[p] != 0.0 else theta[p]
            gp = -np.float32(ivar[p]) * diff
            if g[p] is not None:
                gp = g[p] + gp
            if temp != 1.0:
                gp = np.float32(temp) * gp
            grads.append(gp)
        return val, grads

    return vg


def make_incremental_gibbs_dense(model, x, y):
    """Incremental log-posterior evaluation in the dense chain-tile layout,
    for blocked Gibbs sweeps (same contract as ops/mlp_math.py::
    make_incremental_gibbs, reference gibbs.py:73-94 semantics): a node-block
    proposal perturbs one unit (layer l, node j), so only that unit's
    activation and everything downstream is recomputed from a cache.

    Cache entries are [8, C] tiles keyed per (unit, data point): hidden
    activations ``('a', l, j, d)`` plus per-point output terms — BCE log-lik
    contributions ``('ll', j, d)`` or CE logits ``('z', j, d)``. Returns
    ``(cache_keys, init, updates)`` with ``init(theta) -> (val, cache)`` and
    ``updates[(l, j)](theta, cache) -> (val, new_cache)``; UNCHANGED cache
    entries come back as the very same objects so callers can where-select
    only what moved. Values are bit-identical to ``make_vg_dense``'s
    ``with_grad=False`` forward (same op order)."""
    dims, bias, loss_kind, layer_offsets = extract_arch(model)
    x, y, loc, ivar, prior_const, temperature = prepare_dense(model, x, y)
    n = x.shape[0]
    num_layers = len(dims) - 1
    k_out = dims[-1]
    P = model.num_params
    temp = float(temperature)

    def w_idx(l, j, i):
        w_off, _ = layer_offsets[l]
        return w_off + j * dims[l] + i

    def b_idx(l, j):
        _, b_off = layer_offsets[l]
        return b_off + j

    cache_keys = tuple(
        ("a", l, j, d)
        for l in range(num_layers - 1)
        for j in range(dims[l + 1])
        for d in range(n)
    ) + tuple(
        ("ll" if loss_kind == "bce" else "z", j, d)
        for j in range(k_out) for d in range(n)
    )
    key_pos = {k: i for i, k in enumerate(cache_keys)}

    def unit_z(theta, cache, l, j, d):
        acc = theta[b_idx(l, j)] if bias[l] else None
        if l == 0:
            for i in range(dims[0]):
                c = float(x[d, i])
                if c == 0.0:
                    continue
                term = theta[w_idx(0, j, i)]
                if c != 1.0:
                    term = np.float32(c) * term
                acc = term if acc is None else acc + term
        else:
            for i in range(dims[l]):
                term = cache[key_pos[("a", l - 1, i, d)]] * theta[w_idx(l, j, i)]
                acc = term if acc is None else acc + term
        return acc  # None only for a bias-less all-zero input row

    def bce_unit_ll(z, j, d):
        yv = float(y[d, j])
        e = jnp.exp(-jnp.abs(z))
        sp = jnp.maximum(z, 0.0) + jnp.log1p(e)
        return (np.float32(yv) * z - sp) if yv != 0.0 else -sp

    def ce_point_ll(zs, d):
        zmax = zs[0]
        for j in range(1, k_out):
            zmax = jnp.maximum(zmax, zs[j])
        sumexp = None
        for j in range(k_out):
            e = jnp.exp(zs[j] - zmax)
            sumexp = e if sumexp is None else sumexp + e
        lse = zmax + jnp.log(sumexp)
        picked = None
        for j in range(k_out):
            yv = float(y[d, j])
            if yv == 0.0:
                continue
            term = zs[j] if yv == 1.0 else np.float32(yv) * zs[j]
            picked = term if picked is None else picked + term
        return (picked - lse) if picked is not None else -lse

    def total_val(theta, cache):
        if loss_kind == "bce":
            # accumulate (d outer, j inner) — the same order as
            # make_vg_dense's forward, keeping values bit-identical
            ll = None
            for d in range(n):
                for j in range(k_out):
                    term = cache[key_pos[("ll", j, d)]]
                    ll = term if ll is None else ll + term
        else:
            ll = None
            for d in range(n):
                term = ce_point_ll(
                    [cache[key_pos[("z", j, d)]] for j in range(k_out)], d)
                ll = term if ll is None else ll + term
        val = ll
        for p in range(P):
            diff = theta[p] - np.float32(loc[p]) if loc[p] != 0.0 else theta[p]
            val = val - (np.float32(0.5 * ivar[p]) * diff) * diff
        val = val + np.float32(prior_const)
        return val if temp == 1.0 else np.float32(temp) * val

    def init(theta):
        cache = [None] * len(cache_keys)
        for l in range(num_layers - 1):
            for j in range(dims[l + 1]):
                for d in range(n):
                    cache[key_pos[("a", l, j, d)]] = jax.nn.sigmoid(
                        unit_z(theta, cache, l, j, d))
        for j in range(k_out):
            for d in range(n):
                z = unit_z(theta, cache, num_layers - 1, j, d)
                if loss_kind == "bce":
                    cache[key_pos[("ll", j, d)]] = bce_unit_ll(z, j, d)
                else:
                    cache[key_pos[("z", j, d)]] = z
        return total_val(theta, cache), tuple(cache)

    def make_update(l, j):
        def update(theta, cache):
            cache = list(cache)
            if l < num_layers - 1:
                for d in range(n):
                    cache[key_pos[("a", l, j, d)]] = jax.nn.sigmoid(
                        unit_z(theta, cache, l, j, d))
                for dl in range(l + 1, num_layers - 1):
                    for dj in range(dims[dl + 1]):
                        for d in range(n):
                            cache[key_pos[("a", dl, dj, d)]] = jax.nn.sigmoid(
                                unit_z(theta, cache, dl, dj, d))
                out_units = range(k_out)
            else:
                out_units = (j,)
            for jj in out_units:
                for d in range(n):
                    z = unit_z(theta, cache, num_layers - 1, jj, d)
                    if loss_kind == "bce":
                        cache[key_pos[("ll", jj, d)]] = bce_unit_ll(z, jj, d)
                    else:
                        cache[key_pos[("z", jj, d)]] = z
            return total_val(theta, cache), tuple(cache)
        return update

    updates = {(l, j): make_update(l, j)
               for l in range(num_layers) for j in range(dims[l + 1])}
    return cache_keys, init, updates


def stack_chains(theta0s):
    """[C, P] chain-major params -> [P*8, C/8] dense kernel input with chain
    id c = s*(C/8) + column (s = sublane). C must be a multiple of 8."""
    theta0s = jnp.asarray(theta0s, jnp.float32)
    C, P = theta0s.shape
    if C % 8:
        raise ValueError(f"dense layout needs a multiple of 8 chains, got {C}")
    return theta0s.T.reshape(P * 8, C // 8)


def unstack_chains(dense, num_params):
    """[P*8, lanes] (or [..., P*8, lanes]) -> [..., C, P]."""
    dense = jnp.asarray(dense)
    lanes = dense.shape[-1]
    lead = dense.shape[:-2]
    out = dense.reshape(*lead, num_params, 8 * lanes)
    return jnp.swapaxes(out, -1, -2)
