"""Kernel-backend dispatch: route the public sampling API onto the
VMEM-resident Pallas kernels when the configuration is eligible.

The reference-shaped workflow (`SamplerHarness.run/benchmark`,
`sample_chains` — reference serial_sampler.py:35-52) historically always
took the scanned jit(vmap(scan)) path; the 20-500x whole-loop kernels
(ops/resident_*.py) were reachable only through their ops-level makers.
This module closes that gap: `resolve_backend` decides, per
(transition kernel, model, data, chain count), which engine can run the
request, and `run_kernel_backend` executes it and re-wraps the kernel's raw
outputs in the same stacked-arrays contract the scanned path returns.

Backends:
- ``"dense"``    — chain-tile kernels (ops/*_dense.py): chains on sublanes
  AND lanes, data rows unrolled as constants. Needs a TPU, a full-batch
  schedule, an extract_arch-able model (MLP/LogisticRegression with the
  registered BCE/CE losses), data rows <= MAX_DENSE_ROWS, and a chain count
  divisible by 1024.
- ``"resident"`` — data-on-sublanes kernels (ops/resident_hmc.py,
  resident_walk.py): same whole-loop structure for datasets too big to
  unroll (iris-class). Needs chains divisible by 128.
- ``"scan"``     — the generic jit(vmap(scan)) runner; always eligible.
- ``"auto"``     — dense if eligible, else resident, else scan.

Statistical contract: the kernel backends use the on-core PRNG
(ops/kernel_prng.py), so draws are statistically equivalent but NOT
bit-matched to the scanned path's jax.random streams (device moment parity:
benchmarks/validate_resident.py / validate_dense.py). Recorded keys by
default are ``sample`` plus a DERIVED ``accepted`` flag (sample[t] !=
sample[t-1] — exact for the continuous-proposal samplers at record_thin=1
except the first kept row, which is set from the kernel's true accept
count). An EXPLICIT ``record_keys`` containing ``target_val`` switches the
kernels to IN-KERNEL extras recording (round 5): the log-target value and
an exact per-iteration moved flag are packed into spare rows of the same
record DMA, so ``target_val`` and exact-at-any-thinning ``accepted`` cost
no extra transfers. Other scanned-path state keys (grad_val, momentum, ...)
are not recordable — requesting them falls back to scan. Code that needs
bit-reproducibility against jax.random keys should pass ``backend="scan"``.
"""

import inspect
import math

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.datasets import as_schedule
from eeyore_tpu.kernels.proposal_kernels import NormalKernel
from eeyore_tpu.ops.mlp_dense import MAX_DENSE_ROWS

BACKENDS = ("auto", "scan", "resident", "dense")

# keys the kernel backends can record; an EXPLICIT record_keys request for
# anything else (grad_val, momentum, ...) forces the scanned path.
# target_val/accepted are recorded IN-KERNEL (round 5: packed into the
# record stage's spare rows — exact per-iteration values at any thinning)
# when explicitly requested; the default contract stays sample + derived
# accepted to keep the hot path's record bandwidth minimal.
KERNEL_RECORD_KEYS = frozenset({"sample", "accepted", "target_val"})


def _freeze(v):
    """Hashable fingerprint of a maker kwarg / data array, for the compiled-
    kernel cache key: the makers bake data and hyperparameters into the
    traced program as constants, so the cache must key on their VALUES (the
    scanned path's equivalent is keying on id(schedule), runner.py)."""
    if isinstance(v, (np.ndarray, jax.Array)):
        arr = np.asarray(v)
        return ("ndarray", arr.shape, str(arr.dtype), arr.tobytes())
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    # config objects (tuners): snapshot their scalar attributes so mutating
    # e.g. tuner.d between runs rebuilds, plus identity as a tie-break
    return (type(v).__name__, id(v), tuple(sorted(
        (k, _freeze(x)) for k, x in vars(v).items()
        if isinstance(x, (bool, int, float, str, type(None))))))


def _data_fingerprint(x, y):
    return (x.shape, str(x.dtype), hash(x.tobytes()),
            y.shape, str(y.dtype), hash(y.tobytes()))


def _host_batch0(schedule):
    """Host copies of the schedule's full batch, cached ON the schedule:
    each np.asarray on a device array is one tunnel round trip (~27 ms
    measured, benchmarks/DISPATCH_COST.json) — the makers need host data
    once (baked-in constants) and the cache key needs its bytes once; the
    schedule identity cache (datasets.as_schedule) makes this stick across
    repeated public-API calls with the same data objects."""
    cached = getattr(schedule, "_host_batch0", None)
    if cached is None:
        cached = (np.asarray(schedule.x[0]), np.asarray(schedule.y[0]))
        schedule._host_batch0 = cached
    return cached

_DENSE_BLOCKS = (8192, 4096, 2048, 1024)
_RESIDENT_BLOCKS = (4096, 2048, 1024, 512, 256, 128)
MAX_DISPATCH_PARAMS = 256
# the NUTS kernels unroll the whole 2^depth - 1 leapfrog tree: program
# size and compile time double per level (validated regime 3-5,
# DENSE_NUTS_RESULTS.json depth_scaling; deeper programs have faulted the
# compile service). Deeper budgets run the scanned engine.
MAX_KERNEL_DEPTH = 5


class _Plan:
    def __init__(self, backend, maker, kwargs, chain_block, extra_outputs=0,
                 acc_kind="counts"):
        self.backend = backend
        self.maker = maker
        self.kwargs = kwargs
        self.chain_block = chain_block
        self.extra_outputs = extra_outputs
        # what the kernel's third output holds: "counts" (accepted
        # transitions, [C]), "per_block" (Gibbs sub-block counts, [C, B]),
        # or "stat" (NUTS summed trajectory-mean Metropolis statistic)
        self.acc_kind = acc_kind


def _pick_block(num_chains, candidates, cap=None):
    for cb in candidates:
        if cap is not None and cb > cap:
            continue
        if num_chains % cb == 0:
            return cb
    return None


def _sampler_plan(kernel, x, y, num_chains, num_iters, num_burnin_iters,
                  record_thin, want_dense, record_extras=False):
    """Return a _Plan for the transition kernel, or a (False, reason)."""
    from eeyore_tpu.samplers.gibbs import Gibbs
    from eeyore_tpu.samplers.hmc import HMC
    from eeyore_tpu.samplers.mala import MALA
    from eeyore_tpu.samplers.mh import MetropolisHastings
    from eeyore_tpu.samplers.nuts import NUTS

    common = dict(num_iters=num_iters, num_burnin_iters=num_burnin_iters,
                  record_thin=record_thin, record_extras=record_extras)

    if type(kernel) is MetropolisHastings:
        if not kernel.symmetric or not isinstance(kernel.kernel, NormalKernel):
            return None, "kernel backends support symmetric Normal-proposal MH only"
        scale = np.asarray(kernel.kernel.scale)
        if scale.ndim != 0:
            return None, "kernel backends need a scalar MH proposal scale"
        if want_dense:
            from eeyore_tpu.ops.resident_walk_dense import make_resident_mh_dense
            cb = _pick_block(num_chains, _DENSE_BLOCKS)
            if cb is None:
                return None, "dense MH needs chains divisible by 1024"
            return _Plan("dense", make_resident_mh_dense,
                         dict(scale=float(scale), chain_block=cb, **common), cb), None
        from eeyore_tpu.ops.resident_walk import make_resident_mh
        cb = _pick_block(num_chains, _RESIDENT_BLOCKS)
        if cb is None:
            return None, "resident MH needs chains divisible by 128"
        return _Plan("resident", make_resident_mh,
                     dict(scale=float(scale), chain_block=cb, **common), cb), None

    if type(kernel) is MALA:
        if want_dense:
            from eeyore_tpu.ops.resident_walk_dense import make_resident_mala_dense
            cb = _pick_block(num_chains, _DENSE_BLOCKS)
            if cb is None:
                return None, "dense MALA needs chains divisible by 1024"
            return _Plan("dense", make_resident_mala_dense,
                         dict(step=float(kernel.step_size), chain_block=cb,
                              **common), cb), None
        from eeyore_tpu.ops.resident_walk import make_resident_mala
        # the unrolled forward+backward holds [n_pad, chain_block]
        # activations: cap the block for bigger models (validate_resident
        # uses 4096 for the 23-param XOR MALA)
        cb = _pick_block(num_chains, _RESIDENT_BLOCKS, cap=4096)
        if cb is None:
            return None, "resident MALA needs chains divisible by 128"
        return _Plan("resident", make_resident_mala,
                     dict(step=float(kernel.step_size), chain_block=cb,
                          **common), cb), None

    if type(kernel) is HMC:
        hmc_kw = dict(step=float(kernel.step0), num_steps=int(kernel.num_steps0),
                      tuner=kernel.tuner, **common)
        if kernel.tuner is not None:
            # the kernels unroll the trajectory wall: silently shortening a
            # USER-configured l-rule ceiling would change the sampler, so an
            # explicit > 64 is ineligible; the default (scan ceiling 1024 =
            # effectively uncapped) takes the kernel's validated 64 cap
            if getattr(kernel, "explicit_max_num_steps", True):
                if int(kernel.max_num_steps) > 64:
                    return None, (f"max_num_steps={kernel.max_num_steps} > "
                                  "the kernel unroll cap 64; use the scanned "
                                  "path or lower max_num_steps")
                hmc_kw["max_num_steps"] = int(kernel.max_num_steps)
            else:
                hmc_kw["max_num_steps"] = min(int(kernel.max_num_steps), 64)
            hmc_kw["l_rounding"] = getattr(kernel, "l_rounding", "round")
        if want_dense:
            from eeyore_tpu.ops.resident_hmc_dense import make_resident_hmc_dense
            cb = _pick_block(num_chains, _DENSE_BLOCKS)
            if cb is None:
                return None, "dense HMC needs chains divisible by 1024"
            return _Plan("dense", make_resident_hmc_dense,
                         dict(chain_block=cb, **hmc_kw), cb), None
        from eeyore_tpu.ops.resident_hmc import make_resident_hmc
        # row-streaming vg register-allocates at small blocks (iris optimum
        # 256, benchmarks/PROBE_IRIS_STREAM2.json)
        cap = 256 if x.shape[0] >= 32 else 4096
        cb = _pick_block(num_chains, _RESIDENT_BLOCKS, cap=cap)
        if cb is None:
            return None, "resident HMC needs chains divisible by 128"
        return _Plan("resident", make_resident_hmc,
                     dict(chain_block=cb, **hmc_kw), cb), None

    if type(kernel) is NUTS:
        # max_depth="auto" kernels dispatch as fixed-budget once the probe
        # resolved their depth (fixed-budget == adaptive bit-identically at
        # equal max_depth, so the probed depth cap is the only change)
        auto_ok = (getattr(kernel, "auto_depth", False)
                   and kernel._auto_fingerprint is not None)
        if not kernel.fixed_budget and not auto_ok:
            return None, ("adaptive NUTS has data-dependent trees; only "
                          "fixed_budget=True (or max_depth='auto') "
                          "dispatches to the kernels")
        if int(kernel.max_depth) > MAX_KERNEL_DEPTH:
            return None, (f"max_depth={kernel.max_depth} > MAX_KERNEL_DEPTH="
                          f"{MAX_KERNEL_DEPTH} (the kernels unroll 2^depth-1 "
                          "leapfrogs; deep budgets run the scanned engine)")
        frozen_metric = getattr(kernel, "_frozen_inv_mass", None)
        if kernel.mass_adapt and frozen_metric is None:
            return None, ("mass_adapt needs a FROZEN metric for the kernels: "
                          "use max_depth='auto' (the warmup probe freezes "
                          "the diagonal) or the scanned path")
        nuts_kw = dict(step=float(kernel.step0), max_depth=kernel.max_depth,
                       tuner=kernel.tuner, **common)
        if frozen_metric is not None:
            nuts_kw["inv_mass"] = np.asarray(frozen_metric)
        if want_dense:
            from eeyore_tpu.ops.resident_nuts_dense import make_resident_nuts_dense
            cb = _pick_block(num_chains, _DENSE_BLOCKS)
            if cb is None:
                return None, "dense NUTS needs chains divisible by 1024"
            return _Plan("dense", make_resident_nuts_dense,
                         dict(chain_block=cb, **nuts_kw),
                         cb, extra_outputs=1, acc_kind="stat"), None
        from eeyore_tpu.ops.resident_nuts import make_resident_nuts
        # streamed-vg block cap, as for resident HMC
        cap = 256 if x.shape[0] >= 32 else 4096
        cb = _pick_block(num_chains, _RESIDENT_BLOCKS, cap=cap)
        if cb is None:
            return None, "resident NUTS needs chains divisible by 128"
        return _Plan("resident", make_resident_nuts,
                     dict(chain_block=cb, **nuts_kw),
                     cb, extra_outputs=1, acc_kind="stat"), None

    if type(kernel) is Gibbs:
        gibbs_kw = dict(scales=list(kernel.scales),
                        node_subblock_size=kernel.node_subblock_size, **common)
        if want_dense:
            from eeyore_tpu.ops.resident_walk_dense import make_resident_gibbs_dense
            cb = _pick_block(num_chains, _DENSE_BLOCKS)
            if cb is None:
                return None, "dense Gibbs needs chains divisible by 1024"
            return _Plan("dense", make_resident_gibbs_dense,
                         dict(chain_block=cb, **gibbs_kw), cb,
                         acc_kind="per_block"), None
        from eeyore_tpu.ops.resident_walk import make_resident_gibbs
        # incremental activation cache: 8 x [n_pad, chain_block] tiles
        cb = _pick_block(num_chains, _RESIDENT_BLOCKS, cap=512)
        if cb is None:
            return None, "resident Gibbs needs chains divisible by 128"
        return _Plan("resident", make_resident_gibbs,
                     dict(chain_block=cb, **gibbs_kw), cb,
                     acc_kind="per_block"), None

    return None, f"{type(kernel).__name__} has no kernel backend"


def resolve_backend(kernel, data, num_chains, num_iters, num_burnin_iters=0,
                    record_thin=1, backend="auto", platform=None,
                    record_keys=None):
    """Decide which engine runs this request.

    Returns ``(plan_or_None, reason)``: a :class:`_Plan` when a kernel
    backend will run, else ``(None, why_scan)``. ``backend`` in
    {"auto", "scan", "resident", "dense"}; explicit "resident"/"dense"
    RAISE when ineligible instead of silently falling back.

    ``record_keys``: the caller's EXPLICIT record request (None = the
    sampler default). The kernels record sample/accepted only, so an
    explicit request for anything else (target_val, grad_val, ...) is an
    ineligibility — the data must come from the scanned path, not vanish."""
    if backend not in BACKENDS:
        raise ValueError(f"backend must be one of {BACKENDS}, got {backend!r}")
    if backend == "scan":
        return None, "explicit backend='scan'"

    def fail(reason):
        if backend in ("resident", "dense"):
            raise ValueError(f"backend={backend!r} requested but ineligible: "
                             f"{reason}")
        return None, reason

    record_extras = False
    if record_keys is not None:
        extra = set(record_keys) - KERNEL_RECORD_KEYS
        if extra:
            return fail(f"record_keys {sorted(extra)} not recordable by the "
                        f"kernel backends (they record "
                        f"{sorted(KERNEL_RECORD_KEYS)} only)")
        # target_val turns on in-kernel extras recording (stage-row packed)
        record_extras = "target_val" in record_keys

    platform = platform or jax.default_backend()
    if platform != "tpu":
        return fail("kernel backends need a TPU (on-core PRNG has no "
                    f"{platform} lowering)")
    schedule = as_schedule(data)
    if schedule.num_batches != 1:
        return fail("kernel backends run full-batch only")
    # device arrays are fine here: plan selection reads SHAPES only (no
    # host fetch — each one is a tunnel round trip)
    x = schedule.x[0]
    y = schedule.y[0]
    model = kernel.model
    try:
        from eeyore_tpu.ops.mlp_math import extract_arch
        extract_arch(model)
    except (ValueError, AttributeError) as err:
        return fail(f"model not kernel-compatible: {err}")
    if model.num_params > MAX_DISPATCH_PARAMS:
        # whole-loop residency is a small-state design: loop-carried
        # [P, lanes] values spill past the 128MB VMEM at large P (measured
        # boundary: P=594 works at cb128 with a raised vmem limit, P=12730
        # spills 202MB — benchmarks/WIDE_MODEL_RESULTS.json). Auto-dispatch
        # stays in the regime validated with default limits; larger models
        # use the ops makers with explicit chain_block/vmem_limit_bytes.
        return fail(f"{model.num_params} params > MAX_DISPATCH_PARAMS="
                    f"{MAX_DISPATCH_PARAMS} (whole-loop residency is for "
                    "small-state models; use the ops-level makers)")

    dense_ok = x.shape[0] <= MAX_DENSE_ROWS
    order = []
    if backend == "dense":
        order = [True]
    elif backend == "resident":
        order = [False]
    else:  # auto: dense first when the data fits, then sublane
        order = ([True, False] if dense_ok else [False])

    last_reason = None
    for want_dense in order:
        if want_dense and not dense_ok:
            last_reason = (f"{x.shape[0]} data rows > MAX_DENSE_ROWS="
                           f"{MAX_DENSE_ROWS}")
            continue
        plan, reason = _sampler_plan(kernel, x, y, num_chains, num_iters,
                                     num_burnin_iters, record_thin, want_dense,
                                     record_extras=record_extras)
        if plan is not None:
            return plan, None
        last_reason = reason
    return fail(last_reason or "no eligible kernel backend")


def _seed_from_key(key):
    return int(jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1)))


def _device_seed(key):
    """Kernel seed as a DEVICE scalar: the jitted wrappers take it traced,
    so deriving it never synchronizes the host (int() on a fresh device
    value is one tunnel round trip — benchmarks/DISPATCH_COST.json)."""
    return jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1))


def run_kernel_backend(kernel, key, theta0s, data, num_iters,
                       num_burnin_iters, plan, record_thin=1,
                       needs_accepted=True):
    """Execute a resolved plan; returns ``(recorded, info)`` where
    ``recorded`` matches ``sample_chains(..., return_arrays=True)``'s
    stacked-array convention ({"sample": [C, kept, P], "accepted":
    [C, kept]}) and ``info`` carries the kernel's exact per-chain accept
    counts (and divergence sums for NUTS) plus the final states.

    ``needs_accepted=False`` skips the derived accepted flags (an
    O(C x kept x P) comparison pass over the samples — callers recording
    only samples save it)."""
    schedule = as_schedule(data)
    x, y = _host_batch0(schedule)
    theta0s = jnp.asarray(theta0s, jnp.float32)

    cache = getattr(kernel, "_backend_cache", None)
    if cache is None:
        cache = kernel._backend_cache = {}
    # data values and hyperparameters are baked into the traced kernel as
    # constants: key on them (not just shapes) so re-running the same
    # sampler object on different data, or after mutating step/scale,
    # rebuilds instead of silently reusing a stale compiled kernel
    cache_key = (plan.maker.__name__, theta0s.shape, num_iters,
                 num_burnin_iters, record_thin, plan.chain_block,
                 needs_accepted, _data_fingerprint(x, y),
                 _freeze(plan.kwargs))
    want_extras = bool(plan.kwargs.get("record_extras", False))
    if cache_key not in cache:
        base = plan.maker(kernel.model, x, y, **plan.kwargs)
        # dispatch always supplies chain-major [C, P] inits; say so for
        # makers whose fn would otherwise shape-sniff (ambiguous at C == 8P)
        base_kw = ({"dense_input": False}
                   if "dense_input" in inspect.signature(base).parameters
                   else {})
        acc_kind = plan.acc_kind

        def wrapped(seed, th):
            out = base(seed, th, **base_kw)
            if want_extras:
                out, vals, flags = out[:-2], out[-2], out[-1]
            # chain-major [C, kept, P] INSIDE the jit so XLA fuses this with
            # the kernel's own unstack transpose; likewise the derived
            # accepted flags — fused into the same program both are free
            # next to the kernel (benchmarks/PROBE_RELAYOUT2.json raw vs
            # raw_t_acc_cm), while as separate dispatches each pays its own
            # pass + tunnel dispatch
            samples = jnp.swapaxes(out[0], 0, 1)
            rest = tuple(out[1:])
            if want_extras:
                # in-kernel exact per-iteration values, [kept, C] -> [C, kept]
                return (samples, flags.T, vals.T) + rest
            if not needs_accepted:
                return (samples,) + rest
            # derived accepted: moved-vs-previous; when the kernel's acc
            # output is a transition count (MH/MALA/HMC, record_thin=1) the
            # first kept row takes the count's remainder so mean(accepted)
            # == acc/kept
            acc = out[2]
            moved = jnp.any(samples[:, 1:, :] != samples[:, :-1, :], axis=-1)
            if acc_kind == "counts" and record_thin == 1:
                first = jnp.clip(jnp.round(acc - moved.sum(axis=1)), 0, 1)
            else:
                first = jnp.ones(moved.shape[0], dtype=moved.dtype)
            accepted = jnp.concatenate(
                [first[:, None].astype(moved.dtype), moved],
                axis=1).astype(jnp.int32)
            return (samples, accepted) + rest

        cache[cache_key] = jax.jit(wrapped)
    fn = cache[cache_key]

    out = fn(_device_seed(key), theta0s)
    recorded = {"sample": out[0]}
    if want_extras:
        recorded["accepted"] = out[1]
        recorded["target_val"] = out[2]
        out = out[:1] + out[3:]
    elif needs_accepted:
        recorded["accepted"] = out[1]
        out = out[:1] + out[2:]
    final, acc = out[1], out[2]
    extras = out[3:]
    kept = (num_iters - num_burnin_iters) // record_thin
    info = {"accept_counts": acc, "final": final, "kept": kept,
            "backend": plan.backend}
    if plan.extra_outputs:
        info["divergent_sums"] = extras[0]
    return recorded, info


# ----------------------------------------------------------------------
# Tempering-ladder dispatch (PowerPosteriorSampler.run -> resident kernels)
# ----------------------------------------------------------------------

def resolve_tempering(pp, data, num_iters, num_burnin_iters=0,
                      record_thin=1, backend="auto", platform=None,
                      record_keys=None):
    """Dispatch decision for a power-posterior ladder run: the whole-ladder
    resident kernels (ops/resident_tempering{_dense}.py) run even/odd swap
    parallel tempering with MALA/MH within-moves — the reference's ladder
    sampler pair (power_posterior_sampler.py:68-82). Categorical swaps (the
    reference's default scheme) keep the scanned path: their serial
    single-pair draws don't vectorize into lane shuffles."""
    if backend not in BACKENDS:
        raise ValueError(f"backend must be one of {BACKENDS}, got {backend!r}")
    if backend == "scan":
        return None, "explicit backend='scan'"

    def fail(reason):
        if backend in ("resident", "dense"):
            raise ValueError(f"backend={backend!r} requested but ineligible: "
                             f"{reason}")
        return None, reason

    record_extras = False
    if record_keys is not None:
        extra = set(record_keys) - KERNEL_RECORD_KEYS
        if extra:
            return fail(f"record_keys {sorted(extra)} not recordable by the "
                        "tempering kernels")
        record_extras = "target_val" in record_keys

    platform = platform or jax.default_backend()
    if platform != "tpu":
        return fail("kernel backends need a TPU")
    schedule = as_schedule(data)
    if schedule.num_batches != 1:
        return fail("kernel backends run full-batch only")
    if pp.swap_scheme != "even_odd":
        return fail("resident tempering implements even/odd swaps; "
                    "categorical stays scanned")
    if pp.sampler not in ("MALA", "MetropolisHastings"):
        return fail(f"ladder sampler {pp.sampler!r} has no kernel")
    extra = set(pp.sampler_kwargs) - {"step", "scale"}
    if extra:
        return fail(f"sampler_kwargs {sorted(extra)} not kernel-mappable")
    x = schedule.x[0]  # shape-only use: no host fetch
    model = pp.model
    try:
        from eeyore_tpu.ops.mlp_math import extract_arch
        extract_arch(model)
    except (ValueError, AttributeError) as err:
        return fail(f"model not kernel-compatible: {err}")
    if model.num_params > MAX_DISPATCH_PARAMS:
        return fail(f"{model.num_params} params > MAX_DISPATCH_PARAMS="
                    f"{MAX_DISPATCH_PARAMS}")

    L = int(pp.num_chains)
    # defaults must match the scanned path's inner samplers: MALA(step=0.1)
    # (mala.py:29), MetropolisHastings -> NormalKernel(scale=1.0) (mh.py:28)
    if pp.sampler == "MALA":
        step = float(pp.sampler_kwargs.get("step", 0.1))
    else:
        step = float(pp.sampler_kwargs.get("scale", 1.0))
    kw = dict(num_rungs=L, step=step, sampler=pp.sampler,
              temperatures=np.asarray(pp.temperatures, np.float64),
              between_step=pp.between_step, num_iters=num_iters,
              num_burnin_iters=num_burnin_iters, record_thin=record_thin,
              record_extras=record_extras)

    dense_ok = x.shape[0] <= MAX_DENSE_ROWS and backend in ("auto", "dense")
    if dense_ok:
        # smallest dense block that holds whole ladders
        for cb in sorted(_DENSE_BLOCKS):
            if cb % L == 0:
                from eeyore_tpu.ops.resident_tempering_dense import (
                    make_resident_tempering_dense,
                )
                return _Plan("dense", make_resident_tempering_dense,
                             dict(chain_block=cb, **kw), cb,
                             acc_kind="per_block"), None
    if backend in ("auto", "resident"):
        for cb in sorted(_RESIDENT_BLOCKS):
            if cb % L == 0:
                from eeyore_tpu.ops.resident_tempering import (
                    make_resident_tempering,
                )
                return _Plan("resident", make_resident_tempering,
                             dict(chain_block=cb, **kw), cb,
                             acc_kind="per_block"), None
    return fail(f"no kernel block divisible by the {L}-rung ladder")


# ----------------------------------------------------------------------
# SMC dispatch (SMCSampler.run -> resident mutation driver)
# ----------------------------------------------------------------------

def resolve_smc(smc, data, backend="auto", platform=None):
    """Dispatch decision for a tempered-SMC run: the resident driver
    (ops/resident_smc.py::make_resident_smc) runs the whole anneal —
    reweight, ESS-triggered resample, kernel mutation — as one device
    program, with the mutation passes VMEM-resident. Architecture models
    (MLP/LogisticRegression) use the chain-lane split vg; DistributionModel
    targets with an explicit base (init_sampler + base_log_pdf) use the
    generic per-lane traced vg. Returns (chain_block_or_None, reason)."""
    if backend not in BACKENDS:
        raise ValueError(f"backend must be one of {BACKENDS}, got {backend!r}")
    if backend == "scan":
        return None, "explicit backend='scan'"

    def fail(reason):
        if backend in ("resident", "dense"):
            raise ValueError(f"backend={backend!r} requested but ineligible: "
                             f"{reason}")
        return None, reason

    if backend == "dense":
        return fail("SMC has a resident mutation kernel only (particle "
                    "clouds are iris-class state); use backend='resident'")
    platform = platform or jax.default_backend()
    if platform != "tpu":
        return fail("kernel backends need a TPU")
    if smc.mutation not in ("MALA", "MH"):
        return fail(f"mutation {smc.mutation!r} has no kernel")
    if smc.model.num_params > MAX_DISPATCH_PARAMS:
        return fail(f"{smc.model.num_params} params > MAX_DISPATCH_PARAMS="
                    f"{MAX_DISPATCH_PARAMS}")
    if smc._is_bayesian:
        try:
            from eeyore_tpu.ops.mlp_math import extract_arch
            extract_arch(smc.model)
        except (ValueError, AttributeError) as err:
            return fail(f"model not kernel-compatible: {err}")
    elif smc.base_log_pdf is None or smc.init_sampler is None:
        return fail("non-Bayesian targets need init_sampler + base_log_pdf "
                    "for the kernel's geometric path")
    # the mutation kernel's unrolled forward holds [n_pad, block]
    # activations in scoped VMEM: iris/banknotes-class data OOMs past
    # block 1024 (~16MB limit; 4096 validated for tiny-n only). The
    # generic per-lane path's batch-first [cb, small] intermediates pad
    # lanes to 128 — cap it at 1024 too.
    if smc._is_bayesian:
        n_rows = np.asarray(data[0]).shape[0] if isinstance(
            data[0], np.ndarray) else data[0].shape[0]
        cap = 4096 if n_rows <= 32 else 1024
    else:
        cap = 1024
    cb = _pick_block(smc.num_particles, _RESIDENT_BLOCKS, cap=cap)
    if cb is None:
        return fail("resident SMC needs particles divisible by 128")
    return cb, None


def run_smc_backend(smc, key, data, chain_block):
    """Execute a resolved SMC plan: build (and cache on the sampler) the
    resident runner, run it, and re-wrap outputs in SMCSampler.run's
    (state, diagnostics) contract. Kernel PRNG: statistically equivalent,
    not bit-matched to the scanned path."""
    from eeyore_tpu.ops.resident_smc import make_resident_smc
    from eeyore_tpu.samplers.smc import SMCState, log_ess

    schedule = as_schedule(data)
    x, y = _host_batch0(schedule)
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)

    cache = getattr(smc, "_backend_cache", None)
    if cache is None:
        cache = smc._backend_cache = {}
    betas_key = ("adaptive" if smc.adaptive
                 else _freeze(np.asarray(smc.betas)))
    cache_key = (chain_block, betas_key, smc.num_mutation_steps,
                 smc.mutation, float(smc.mutation_step),
                 float(smc.ess_threshold), float(smc.adaptive_target_ess),
                 int(smc.max_stages), _data_fingerprint(x, y),
                 id(smc.base_log_pdf), id(smc.init_sampler))
    if cache_key not in cache:
        cache[cache_key] = make_resident_smc(
            smc.model, x, y, num_particles=smc.num_particles,
            betas=("adaptive" if smc.adaptive else np.asarray(smc.betas)),
            num_mutation_steps=smc.num_mutation_steps, mutation=smc.mutation,
            mutation_step=smc.mutation_step, ess_threshold=smc.ess_threshold,
            chain_block=chain_block,
            adaptive_target_ess=smc.adaptive_target_ess,
            max_stages=smc.max_stages, init_sampler=smc.init_sampler,
            base_log_pdf=smc.base_log_pdf)
    runner = cache[cache_key]

    particles, log_w, diags = runner(_device_seed(key))
    num_stages = int(diags.get("num_stages", len(np.asarray(diags["beta"]))))
    final_beta = float(diags.get("final_beta", 1.0))
    ess = float(diags.pop("final_weight_ess"))
    diags.pop("final_beta", None)
    state = SMCState(
        particles=particles, log_weights=jnp.asarray(log_w),
        log_lik=jnp.zeros(smc.num_particles, dtype=jnp.float32),
        beta=jnp.asarray(final_beta, jnp.float32),
        ess=jnp.asarray(ess),
        unique_frac=jnp.asarray(diags["unique_frac"][num_stages - 1]))
    return state, diags


def run_tempering_backend(pp, key, theta0, data, num_iters,
                          num_burnin_iters, plan, record_thin=1,
                          all_ladders=False):
    """Execute a resolved tempering plan for ONE logical ladder: the kernel
    runs chain_block lanes (chain_block / num_rungs ladders diverging
    through the on-core PRNG) and ladder 0's rungs are returned, coldest
    chain last — pp.run's layout.

    ``all_ladders=True`` keeps every ladder the kernel already computed
    (chain_block / num_rungs of them): the returned ChainLists holds
    ``num_ladders * L`` chains ordered ladder-major (ladder g's rungs at
    chains [g*L, (g+1)*L), coldest last within each ladder), so cross-ladder
    diagnostics (multi_rhat per rung — reference chain_lists.py:122-155)
    come free instead of re-running."""
    from eeyore_tpu.chains import ChainLists

    schedule = as_schedule(data)
    x, y = _host_batch0(schedule)
    L = int(pp.num_chains)

    cache = getattr(pp, "_backend_cache", None)
    if cache is None:
        cache = pp._backend_cache = {}
    keep = plan.chain_block if all_ladders else L
    cache_key = (plan.maker.__name__, num_iters, num_burnin_iters,
                 record_thin, plan.chain_block, keep,
                 _data_fingerprint(x, y), _freeze(plan.kwargs))
    want_extras = bool(plan.kwargs.get("record_extras", False))
    if cache_key not in cache:
        base = plan.maker(pp.model, x, y, **plan.kwargs)
        # the kernel carries the UNTEMPERED base log-target (temperatures
        # enter at the accept tests); pp's recorded target_val contract is
        # the TEMPERED value (reference power_posterior_sampler semantics)
        temps_row = jnp.asarray(np.tile(np.asarray(pp.temperatures,
                                                   np.float32), keep // L
                                        if keep % L == 0 else 1)[:keep])

        def wrapped(seed, theta0s):
            out = base(seed, theta0s)
            samples = out[0]
            ladders = jnp.swapaxes(samples[:, :keep, :], 0, 1)  # [keep, kept, P]
            if want_extras:
                vals, flags = out[-2], out[-1]       # [kept, C] each
                tempered = vals[:, :keep].T * temps_row[:, None]
                return (ladders, flags[:, :keep].T.astype(jnp.int32),
                        tempered)
            moved = jnp.any(ladders[:, 1:, :] != ladders[:, :-1, :], axis=-1)
            accepted = jnp.concatenate(
                [jnp.ones((keep, 1), dtype=moved.dtype), moved],
                axis=1).astype(jnp.int32)
            return ladders, accepted

        cache[cache_key] = jax.jit(wrapped)
    fn = cache[cache_key]

    theta0 = jnp.asarray(theta0, jnp.float32)
    if theta0.ndim == 1:
        theta0s = jnp.broadcast_to(theta0, (plan.chain_block,) + theta0.shape)
    else:  # [L, P] per-rung inits, tiled across the block's ladders
        theta0s = jnp.tile(theta0, (plan.chain_block // L, 1))
    out = fn(_device_seed(key), theta0s)
    arrays = {"sample": np.asarray(out[0]), "accepted": np.asarray(out[1])}
    if want_extras:
        arrays["target_val"] = np.asarray(out[2])
    chains = ChainLists.from_arrays(arrays)
    return chains
