"""On-device validation + throughput for the VMEM-resident Pallas kernels
(ops/resident_hmc.py, ops/resident_walk.py, ops/resident_tempering.py,
ops/resident_smc.py) against the scanned XLA paths.

For each sampler the resident kernel and the scanned jit(vmap(scan)) kernel
run the SAME statistical problem (BASELINE.md configs 1-3); we check pooled
posterior means agree within cross-chain Monte-Carlo error and acceptance
rates within 0.02, then record samples/s and mean-chain-ESS/s for both paths.

Writes benchmarks/RESIDENT_RESULTS.json and prints one JSON line per config.
TPU-only (the on-core PRNG has no CPU lowering).
"""

import json
import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_eeyore")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from eeyore_tpu import stats as st
from eeyore_tpu.datasets import BatchSchedule, XYDataset
from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.ops.resident_hmc import make_resident_hmc
from eeyore_tpu.ops.resident_walk import (
    make_resident_gibbs,
    make_resident_mala,
    make_resident_mh,
)
from eeyore_tpu.samplers import HMC, MALA, Gibbs, MetropolisHastings
from eeyore_tpu.samplers.runner import run_fn

DT = jnp.float32
C = 32768
T = 2048
BURNIN = 1024
ESS_CHAINS = 24
MOMENT_CHAINS = 2048


def xor_data():
    x = jnp.asarray([[0., 0.], [0., 1.], [1., 0.], [1., 1.]], dtype=DT)
    y = jnp.asarray([[0.], [1.], [1.], [0.]], dtype=DT)
    return x, y


def iris_data():
    ds = XYDataset.from_eeyore("iris", yonehot=True)
    return jnp.asarray(ds.x, DT), jnp.asarray(ds.y, DT)


def mlp_model(dims, loss="binary_classification", acts=None):
    hp = (mlp.Hyperparameters(dims=dims) if acts is None
          else mlp.Hyperparameters(dims=dims, activations=acts))
    return MLP(loss=loss_functions[loss], hparams=hp, dtype=DT)


def summarize(samples, acc_rate, elapsed, num_chains, num_iters):
    """samples: [n_chain_subset, kept, P] float64; acc_rate: scalar."""
    chain_means = samples.mean(axis=1)               # [c, P]
    pooled_mean = chain_means.mean(axis=0)
    se = chain_means.std(axis=0, ddof=1) / np.sqrt(chain_means.shape[0])
    ess = []
    for c in range(min(ESS_CHAINS, samples.shape[0])):
        try:
            ess.append(st.multi_ess(samples[c], method="inse"))
        except RuntimeError:
            pass
    mean_ess = float(np.mean(ess)) if ess else float("nan")
    return {
        "samples_per_s": num_chains * num_iters / elapsed,
        "ess_per_s": mean_ess * num_chains / elapsed,
        "mean_chain_ess": mean_ess,
        "acceptance": float(acc_rate),
        "pooled_mean": pooled_mean,
        "mean_se": se,
        "elapsed_s": elapsed,
    }


def run_resident(make_fn, model, num_iters=T, burnin=BURNIN, num_chains=C):
    fn = jax.jit(make_fn)
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (num_chains, model.num_params), dtype=DT)
    samples, final, acc = fn(7, theta0s)
    jax.block_until_ready(final)
    t0 = time.perf_counter()
    samples, final, acc = fn(7, theta0s)
    jax.block_until_ready(final)
    elapsed = time.perf_counter() - t0
    # samples: [kept, C, P] -> host subset [MOMENT_CHAINS, kept, P]
    sub = np.asarray(samples[:, :MOMENT_CHAINS, :], dtype=np.float64)
    sub = np.swapaxes(sub, 0, 1)
    acc_rate = float(np.asarray(acc).mean()) / max(num_iters - burnin, 1)
    return summarize(sub, acc_rate, elapsed, num_chains, num_iters)


def run_scanned(kernel, data, num_iters=T, burnin=BURNIN, num_chains=C):
    schedule = BatchSchedule.full_batch(*data)
    kernel.recompute_current = False
    if hasattr(kernel, "num_burnin_iters"):
        kernel.num_burnin_iters = burnin
    model = kernel.model
    fn = jax.jit(jax.vmap(run_fn(kernel, schedule, num_iters, burnin,
                                 ("sample", "accepted"))))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_chains)
    theta0s = 0.1 * jax.random.normal(key, (num_chains, model.num_params), dtype=DT)
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, rec = fn(keys, theta0s)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    sub = np.asarray(rec["sample"][:MOMENT_CHAINS], dtype=np.float64)
    acc_rate = float(np.asarray(rec["accepted"], dtype=np.float64).mean())
    return summarize(sub, acc_rate, elapsed, num_chains, num_iters)


def compare(name, res, scan):
    """Moment agreement: |mean_r - mean_s| < 6 * combined SE (+ f32 slack)."""
    diff = np.abs(res["pooled_mean"] - scan["pooled_mean"])
    tol = 6.0 * np.sqrt(res["mean_se"] ** 2 + scan["mean_se"] ** 2) + 1e-3
    moments_ok = bool(np.all(diff < tol))
    acc_ok = abs(res["acceptance"] - scan["acceptance"]) < 0.02
    out = {
        "config": name,
        "resident_sps": round(res["samples_per_s"], 1),
        "scanned_sps": round(scan["samples_per_s"], 1),
        "speedup": round(res["samples_per_s"] / scan["samples_per_s"], 2),
        "resident_ess_per_s": round(res["ess_per_s"], 1),
        "scanned_ess_per_s": round(scan["ess_per_s"], 1),
        "resident_acceptance": round(res["acceptance"], 4),
        "scanned_acceptance": round(scan["acceptance"], 4),
        "max_moment_diff": float(diff.max()),
        "max_moment_tol": float(tol.max()),
        "moments_match": moments_ok,
        "acceptance_match": acc_ok,
    }
    print(json.dumps(out), flush=True)
    return out


def config_mh():
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    res = run_resident(make_resident_mh(model, np.asarray(x), np.asarray(y),
                                        scale=0.1, num_iters=T,
                                        num_burnin_iters=BURNIN, chain_block=8192),
                       model)
    scan = run_scanned(MetropolisHastings(model, scale=0.1), (x, y))
    return compare("mh_mlp221_xor", res, scan)


def config_mala():
    model = mlp_model([2, 3, 2, 1])
    x, y = xor_data()
    # chain_block 4096: the unrolled forward+backward of the 23-param model
    # holds ~18MB of [n_pad, chain_block] activations at 8192 — over the 16MB
    # scoped-VMEM limit
    res = run_resident(make_resident_mala(model, np.asarray(x), np.asarray(y),
                                          step=0.01, num_iters=T,
                                          num_burnin_iters=BURNIN, chain_block=4096),
                       model)
    scan = run_scanned(MALA(model, step=0.01), (x, y))
    return compare("mala_mlp2321_xor", res, scan)


def config_hmc():
    model = mlp_model([4, 3, 3], loss="multiclass_classification",
                      acts=[mlp.sigmoid, None])
    xi, yi = iris_data()
    # row-streaming vg (auto for n>=32) + chain_block 256: the streamed
    # chunk pipeline register-allocates at 2 lane-tiles per row group —
    # larger blocks round-trip VMEM between ops and lose ~20-35%
    # (benchmarks/PROBE_IRIS_STREAM2.json)
    res = run_resident(make_resident_hmc(model, np.asarray(xi), np.asarray(yi),
                                         step=0.02, num_steps=8, num_iters=T,
                                         num_burnin_iters=BURNIN, chain_block=256),
                       model, num_chains=16384)
    scan = run_scanned(HMC(model, step=0.02, num_steps=8), (xi, yi),
                       num_chains=16384)
    return compare("hmc_mlp433_iris", res, scan)


def config_gibbs():
    # report.py config-4 shapes (C=8192, T=1024, burnin=512) so the scanned
    # side reuses the persistent-cache entry
    model = mlp_model([4, 3, 2, 3], loss="multiclass_classification",
                      acts=[mlp.sigmoid, mlp.sigmoid, None])
    xi, yi = iris_data()
    # chain_block 512: the incremental-evaluation activation cache (8 x
    # [152, chain_block] VMEM arrays) blows the 16MB scoped-VMEM budget at
    # 1024 lanes (measured 20.4M)
    res = run_resident(make_resident_gibbs(model, np.asarray(xi), np.asarray(yi),
                                           scales=0.1, num_iters=1024,
                                           num_burnin_iters=512, chain_block=512),
                       model, num_iters=1024, burnin=512, num_chains=8192)
    scan = run_scanned(Gibbs(model, scales=0.1), (xi, yi),
                       num_iters=1024, burnin=512, num_chains=8192)
    return compare("gibbs_mlp4323_iris", res, scan)


def config_tempering():
    """Resident parallel-tempering vs the scanned even/odd PowerPosterior:
    coldest-rung moments, within-chain acceptance, plus the on-device swap
    algebra pin (an equal-temperature ladder must accept every swap)."""
    from eeyore_tpu.ops.resident_tempering import make_resident_tempering
    from eeyore_tpu.samplers.power_posterior import PowerPosteriorSampler

    L, between = 8, 10
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    num_chains = C // 2  # 16384 lanes = 2048 ladders of 8 rungs
    cold = slice(L - 1, None, L)

    fn = jax.jit(make_resident_tempering(
        model, np.asarray(x), np.asarray(y), num_rungs=L, step=0.05,
        sampler="MALA", between_step=between, num_iters=T,
        num_burnin_iters=BURNIN, chain_block=2048))
    theta0s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                      (num_chains, model.num_params), dtype=DT)
    samples, final, counts = fn(7, theta0s)
    jax.block_until_ready(final)
    t0 = time.perf_counter()
    samples, final, counts = fn(7, theta0s)
    jax.block_until_ready(final)
    elapsed = time.perf_counter() - t0
    sub = np.swapaxes(np.asarray(samples[:, cold][:, :MOMENT_CHAINS, :],
                                 dtype=np.float64), 0, 1)
    counts = np.asarray(counts)
    within_rate = float(counts[:, 0].mean()) / (T - BURNIN)
    # post-burn-in swap rounds by parity (a lane is eligible on rounds
    # matching its rung parity)
    rounds = np.arange(BURNIN, T)
    rounds = rounds[rounds % between == 0]
    parities = (rounds // between) % 2
    rung = np.arange(num_chains) % L
    eligible = np.where(rung % 2 == 0, (parities == 0).sum(), (parities == 1).sum())
    eligible = np.where(rung == L - 1, 0, eligible)
    lower = eligible > 0
    swap_rate = float((counts[lower, 1] / eligible[lower]).mean())
    res = summarize(sub, within_rate, elapsed, num_chains, T)

    # scanned comparator: vmap over replica ladders of the even/odd scheme
    pp = PowerPosteriorSampler(model, num_chains=L, sampler="MALA",
                               sampler_kwargs={"step": 0.05},
                               between_step=between, swap_scheme="even_odd")
    R = 2048
    schedule = BatchSchedule.full_batch(x, y)

    def run(key, theta0s):
        init_key, chain_key = jax.random.split(key)
        xb, yb = schedule.batch(0)
        state = pp.init(theta0s, xb, yb, key=init_key)

        def body(state, i):
            state, info = pp.step(jax.random.fold_in(chain_key, i), state, xb, yb, i)
            return state, {"sample": info["sample"], "accepted": info["accepted"]}

        state, _ = jax.lax.scan(body, state, jnp.arange(BURNIN))
        state, rec = jax.lax.scan(body, state, jnp.arange(BURNIN, T))
        return state, rec

    keys = jax.random.split(jax.random.PRNGKey(1), R)
    theta0s_s = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                        (R, L, model.num_params), dtype=DT)
    sfn = jax.jit(jax.vmap(run))
    state, rec = sfn(keys, theta0s_s)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, rec = sfn(keys, theta0s_s)
    jax.block_until_ready(state)
    elapsed_s = time.perf_counter() - t0
    # rec["sample"]: [R, kept, L, P] -> coldest rung chains [R, kept, P]
    cold_s = np.asarray(rec["sample"][:, :, L - 1, :][:MOMENT_CHAINS],
                        dtype=np.float64)
    acc_s = float(np.asarray(rec["accepted"], dtype=np.float64).mean())
    scan = summarize(cold_s, acc_s, elapsed_s, R * L, T)

    out = compare("tempering_mlp221_xor", res, scan)
    out["resident_swap_rate"] = round(swap_rate, 4)

    # swap-algebra pin: equal temperatures => log-rate identically 0 =>
    # every eligible swap accepts (log u < 0 a.s.)
    fn_eq = jax.jit(make_resident_tempering(
        model, np.asarray(x), np.asarray(y), num_rungs=L, step=0.05,
        sampler="MALA", temperatures=np.ones(L), between_step=between,
        num_iters=256, num_burnin_iters=0, chain_block=2048))
    _, _, counts_eq = fn_eq(11, theta0s[:2048])
    counts_eq = np.asarray(counts_eq)
    rounds = np.arange(256)
    rounds = rounds[rounds % between == 0]
    parities = (rounds // between) % 2
    rung = np.arange(2048) % L
    eligible = np.where(rung % 2 == 0, (parities == 0).sum(), (parities == 1).sum())
    eligible = np.where(rung == L - 1, 0, eligible)
    swaps_ok = bool(np.all(counts_eq[:, 1] == eligible))
    out["equal_temp_swaps_all_accept"] = swaps_ok
    print(json.dumps({"config": "tempering_swap_pin",
                      "equal_temp_swaps_all_accept": swaps_ok}), flush=True)
    return out


def config_smc():
    """Resident-mutation SMC vs the scanned SMCSampler on the BASELINE
    config-5 problem: weighted posterior moments of the final cloud,
    log-evidence, mutation acceptance, and particle-stage-mutation
    throughput."""
    from eeyore_tpu.ops.resident_smc import make_resident_smc
    from eeyore_tpu.samplers.smc import SMCSampler, log_ess

    N = 16384
    model = mlp_model([2, 2, 1])
    x, y = xor_data()
    betas = [(i / 20) ** 4 for i in range(21)]
    stages, msteps = len(betas) - 1, 5

    def weighted_stats(particles, log_w):
        w = np.asarray(jax.nn.softmax(jnp.asarray(log_w)), dtype=np.float64)
        p = np.asarray(particles, dtype=np.float64)
        mean = w @ p
        var = w @ (p - mean) ** 2
        ess = float(np.exp(np.asarray(log_ess(jnp.asarray(log_w)))))
        return mean, np.sqrt(var), ess

    # resident: first call compiles, second measures (one cached program;
    # seed is a traced scalar, so the warm call does not retrace)
    runner = make_resident_smc(model, np.asarray(x), np.asarray(y), N,
                               betas=betas, num_mutation_steps=msteps,
                               mutation="MALA", mutation_step=0.05)
    runner(0)
    t0 = time.perf_counter()
    particles, log_w, diag = runner(1)
    el_res = time.perf_counter() - t0
    mean_r, sd_r, ess_r = weighted_stats(particles, log_w)

    smc = SMCSampler(model, num_particles=N, betas=betas, mutation="MALA",
                     mutation_step=0.05, num_mutation_steps=msteps)
    smc.run(jax.random.PRNGKey(0), (x, y))
    t0 = time.perf_counter()
    state, sdiag = smc.run(jax.random.PRNGKey(1), (x, y))
    el_scan = time.perf_counter() - t0
    mean_s, sd_s, ess_s = weighted_stats(state.particles, state.log_weights)

    se = np.sqrt(sd_r**2 / ess_r + sd_s**2 / ess_s)
    diff = np.abs(mean_r - mean_s)
    tol = 6.0 * se + 1e-3
    out = {
        "config": "smc_mlp221_xor",
        "resident_mutations_per_s": round(N * stages * msteps / el_res, 1),
        "scanned_mutations_per_s": round(N * stages * msteps / el_scan, 1),
        "speedup": round(el_scan / el_res, 2),
        "resident_log_evidence": round(diag["log_evidence"], 3),
        "scanned_log_evidence": round(sdiag["log_evidence"], 3),
        "resident_acceptance": round(float(np.mean(diag["mutation_acceptance"])), 4),
        "scanned_acceptance": round(float(np.mean(sdiag["mutation_acceptance"])), 4),
        "resident_final_ess": round(diag["final_weight_ess"], 1),
        "scanned_final_ess": round(ess_s, 1),
        "max_moment_diff": float(diff.max()),
        "max_moment_tol": float(tol.max()),
        "moments_match": bool(np.all(diff < tol)),
        "evidence_match": bool(abs(diag["log_evidence"] - sdiag["log_evidence"]) < 0.2),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    assert jax.devices()[0].platform != "cpu", "resident kernels are TPU-only"
    results = {}
    only = sys.argv[1:] or ["mh", "mala", "hmc", "gibbs", "tempering", "smc"]
    for name, fn in [("tempering", config_tempering), ("smc", config_smc),
                     ("mh", config_mh), ("mala", config_mala), ("hmc", config_hmc),
                     ("gibbs", config_gibbs)]:
        if name not in only:
            continue
        try:
            results[name] = fn()
        except Exception as err:  # keep going; partial results still useful
            results[name] = {"error": f"{type(err).__name__}: {err}"[:20000]}
            print(json.dumps({"config": name, "error": results[name]["error"]}),
                  flush=True)

    out = Path(__file__).parent / "RESIDENT_RESULTS.json"
    prior = json.loads(out.read_text()) if out.exists() else {}
    prior.update(results)
    out.write_text(json.dumps(prior, indent=2) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
