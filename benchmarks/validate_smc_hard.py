"""Adaptive SMC on targets that actually temper (VERDICT round-3 item 3).

The XOR config-5 validation collapses to ONE adaptive stage (the posterior
is close enough to the prior); this script exercises the multi-stage
reweight -> resample -> mutate path at scale on two harder problems:

1. Banknotes logistic regression (n=200, 6 standardized features,
   reference examples/samplers/logistic_regression/banknotes/): 16384
   particles, resident-mutation SMC (ops/resident_smc.py) with
   betas="adaptive". The n=200 likelihood is far more concentrated than
   the prior, so ESS-bisection must take MANY stages. Log-evidence is
   cross-checked two ways:
   - a fixed 30-stage quartic-ladder resident SMC run (same mutation
     budget), and
   - an INDEPENDENT thermodynamic-integration estimate: vmapped MALA
     chains at 21 fixed temperatures of the likelihood-tempered path
     pi_b = prior * lik^b, log Z = int_0^1 E_b[log lik] db by trapezoid
     (one jitted program, beta as a per-lane constant).

2. A bimodal 2D Gaussian mixture (modes at +-2.5, component scale 0.4)
   under the scanned SMCSampler's non-Bayesian geometric path from a
   N(0, 3^2) base: both densities are normalized, so the true
   log-evidence is EXACTLY 0 — an analytic anchor the adaptive ladder
   must hit while crossing a genuinely multimodal landscape.

Usage: python benchmarks/validate_smc_hard.py [lr|mixture]
Writes benchmarks/SMC_HARD_RESULTS.json. TPU (mixture also runs on CPU).
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

from eeyore_tpu.datasets import XYDataset  # noqa: E402
from eeyore_tpu.models import DistributionModel, LogisticRegression, loss_functions  # noqa: E402
from eeyore_tpu.models import logistic_regression as lr  # noqa: E402
from eeyore_tpu.ops.resident_smc import make_resident_smc  # noqa: E402
from eeyore_tpu.samplers import SMCSampler  # noqa: E402

N = 16384
MSTEPS = 5
MUT_STEP = 0.05

OUT_PATH = Path(__file__).parent / "SMC_HARD_RESULTS.json"


def lr_model_and_data():
    ds = XYDataset.from_eeyore("banknotes")
    x = (ds.x - ds.x.mean(0)) / ds.x.std(0)
    model = LogisticRegression(loss=loss_functions["binary_classification"],
                               hparams=lr.Hyperparameters(input_size=6),
                               dtype=jnp.float32)
    return model, np.asarray(x, np.float32), np.asarray(ds.y, np.float32)


def run_resident_config(model, x, y, betas, seed=1, chain_block=1024):
    runner = make_resident_smc(
        model, x, y, num_particles=N, betas=betas,
        num_mutation_steps=MSTEPS, mutation="MALA", mutation_step=MUT_STEP,
        chain_block=chain_block)
    runner(0)  # compile
    t0 = time.perf_counter()
    particles, log_w, diags = runner(seed)
    elapsed = time.perf_counter() - t0
    stages = len(np.asarray(diags["beta"]))
    w = np.asarray(jax.nn.softmax(jnp.asarray(log_w)), np.float64)
    p = np.asarray(particles, np.float64)
    return {
        "stages": stages,
        "elapsed_s": round(elapsed, 4),
        "mutations_per_s": round(N * stages * MSTEPS / elapsed, 1),
        "log_evidence": round(diags["log_evidence"], 3),
        "final_weight_ess": round(diags["final_weight_ess"], 1),
        "mean_mutation_acceptance": round(
            float(np.asarray(diags["mutation_acceptance"]).mean()), 4),
        "betas": [round(float(b), 6) for b in np.asarray(diags["beta"])],
        "posterior_mean": [round(v, 4) for v in (w[:, None] * p).sum(0)],
    }


def thermodynamic_integration(model, x, y, num_betas=21, chains_per_beta=256,
                              num_iters=4096, burnin=2048, step=0.02,
                              seed=3):
    """Independent log-evidence: MALA chains at fixed temperatures of the
    likelihood-tempered path, trapezoid over E_b[log lik]. One jitted
    program: beta is a per-lane constant, chains vmapped over
    (beta, chain)."""
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    betas = jnp.linspace(0.0, 1.0, num_betas) ** 3  # denser near 0 where
    # E_b[log lik] moves fastest for a concentrated likelihood
    lanes = num_betas * chains_per_beta
    beta_lane = jnp.repeat(betas, chains_per_beta)          # [lanes]

    def log_lik(t):
        return model.log_lik(t, xj, yj)

    def log_post_b(t, b):
        return model.log_prior(t) + b * log_lik(t)

    vg = jax.value_and_grad(lambda t, b: log_post_b(t, b))

    def mala_step(carry, key):
        t, v, g, b = carry
        prop = t + 0.5 * step * g + jnp.sqrt(step) * jax.random.normal(
            key, t.shape, t.dtype)
        pv, pg = vg(prop, b)
        fwd = prop - (t + 0.5 * step * g)
        bwd = t - (prop + 0.5 * step * pg)
        logr = (pv - v) + (-0.5 * jnp.dot(bwd, bwd) / step
                           + 0.5 * jnp.dot(fwd, fwd) / step)
        acc = jnp.log(jax.random.uniform(jax.random.fold_in(key, 1),
                                         dtype=t.dtype)) < logr
        t = jnp.where(acc, prop, t)
        v = jnp.where(acc, pv, v)
        g = jnp.where(acc, pg, g)
        return (t, v, g, b), log_lik(t)

    def chain(key, theta0, b):
        v, g = vg(theta0, b)
        keys = jax.random.split(key, num_iters)
        (_, _, _, _), lls = jax.lax.scan(mala_step, (theta0, v, g, b), keys)
        return lls[burnin:].mean()

    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, lanes)
    theta0s = 0.1 * jax.random.normal(jax.random.fold_in(key, 7),
                                      (lanes, model.num_params), jnp.float32)
    mean_lls = jax.jit(jax.vmap(chain))(keys, theta0s, beta_lane)
    per_beta = np.asarray(mean_lls, np.float64).reshape(num_betas,
                                                        chains_per_beta)
    e_ll = per_beta.mean(axis=1)
    se_ll = per_beta.std(axis=1, ddof=1) / np.sqrt(chains_per_beta)
    bs = np.asarray(betas, np.float64)
    log_z = float(np.trapezoid(e_ll, bs))
    log_z_se = float(np.sqrt(np.sum(
        (np.gradient(bs) * se_ll) ** 2)))  # quadrature-weight propagation
    return {"log_z": round(log_z, 3), "log_z_se": round(log_z_se, 4),
            "betas": [round(b, 5) for b in bs],
            "mean_log_lik": [round(v, 3) for v in e_ll]}


def lr_case():
    model, x, y = lr_model_and_data()
    out = {}
    out["adaptive"] = run_resident_config(model, x, y, "adaptive")
    print(json.dumps({"adaptive": out["adaptive"]}), flush=True)
    fixed = [(i / 30) ** 4 for i in range(0, 31)]
    out["fixed_quartic_30"] = run_resident_config(model, x, y, fixed)
    print(json.dumps({"fixed_quartic_30": out["fixed_quartic_30"]}), flush=True)
    out["thermodynamic_integration"] = thermodynamic_integration(model, x, y)
    print(json.dumps({"ti": out["thermodynamic_integration"]}), flush=True)

    za = out["adaptive"]["log_evidence"]
    zf = out["fixed_quartic_30"]["log_evidence"]
    zt = out["thermodynamic_integration"]["log_z"]
    out["checks"] = {
        "adaptive_multi_stage": out["adaptive"]["stages"] > 3,
        "evidence_adaptive_vs_fixed": round(abs(za - zf), 3),
        "evidence_adaptive_vs_ti": round(abs(za - zt), 3),
    }
    print(json.dumps({"checks": out["checks"]}), flush=True)
    return out


def mixture_case():
    mu = 3.0
    s = 0.25
    base_scale = 3.0

    def log_mix(t):
        # equal-weight normalized 2d mixture at (+-mu, 0)
        d1 = t - jnp.asarray([mu, 0.0])
        d2 = t + jnp.asarray([mu, 0.0])
        c = -jnp.log(2 * jnp.pi * s * s) - jnp.log(2.0)
        return jnp.logaddexp(c - 0.5 * jnp.dot(d1, d1) / (s * s),
                             c - 0.5 * jnp.dot(d2, d2) / (s * s))

    def base_log_pdf(t):
        return (-jnp.log(2 * jnp.pi * base_scale ** 2)
                - 0.5 * jnp.dot(t, t) / base_scale ** 2)

    def init_sampler(key, n):
        return base_scale * jax.random.normal(key, (n, 2))

    dm = DistributionModel(lambda t, x, y: log_mix(t), num_params=2)
    smc = SMCSampler(dm, num_particles=N, betas="adaptive",
                     num_mutation_steps=MSTEPS, mutation="MALA",
                     mutation_step=0.05, init_sampler=init_sampler,
                     base_log_pdf=base_log_pdf, max_stages=60)
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    t0 = time.perf_counter()
    state, diags = smc.run(jax.random.PRNGKey(2), data)
    elapsed = time.perf_counter() - t0

    w = np.asarray(jax.nn.softmax(state.log_weights), np.float64)
    p = np.asarray(state.particles, np.float64)
    # mode balance: weighted mass on x>0 should be ~0.5
    right_mass = float(w[p[:, 0] > 0].sum())
    out = {
        "stages": int(diags["num_stages"]),
        "elapsed_s": round(elapsed, 3),
        "log_evidence": round(diags["log_evidence"], 4),
        "true_log_evidence": 0.0,
        "right_mode_mass": round(right_mass, 4),
        "final_weight_ess": round(float(state.ess), 1),
        "betas": [round(float(b), 5) for b in np.asarray(diags["beta"])],
        "checks": {
            # >= 3 stages = a ladder that actually tempers (XOR collapses
            # to 1); the binding-constraint resample fix keeps every stage
            # productive, so MORE stages would mean a harder path, not a
            # better test
            "multi_stage": int(diags["num_stages"]) >= 3,
            "evidence_abs_err": round(abs(diags["log_evidence"]), 4),
            "modes_balanced": abs(right_mass - 0.5) < 0.1,
        },
    }
    print(json.dumps({"mixture": out}), flush=True)
    return out


def dispatch_case():
    """Round-4 VERDICT item 3: SMCSampler.run(backend='auto') reaches the
    resident whole-anneal driver through the PUBLIC API — both the
    architecture-model path (banknotes LR) and the generic per-lane-vg
    path (bimodal DistributionModel, previously extract_arch-gated out).
    Evidence must match the scanned path."""
    from eeyore_tpu.samplers.dispatch import resolve_smc

    out = {}

    # -- banknotes LR, adaptive ladder, public API --
    model, x, y = lr_model_and_data()
    smc = SMCSampler(model, num_particles=N, betas="adaptive",
                     num_mutation_steps=MSTEPS, mutation="MALA",
                     mutation_step=MUT_STEP)
    cb, reason = resolve_smc(smc, (x, y))
    assert cb is not None, reason
    key = jax.random.PRNGKey(1)
    state, diags = smc.run(key, (x, y))           # compile
    t0 = time.perf_counter()
    state, diags = smc.run(key, (x, y))
    auto_s = time.perf_counter() - t0
    state_s, diags_s = smc.run(key, (x, y), backend="scan")
    out["banknotes_lr"] = {
        "chain_block": cb,
        "stages_auto": int(diags.get("num_stages",
                                     len(np.asarray(diags["beta"])))),
        "stages_scan": int(diags_s["num_stages"]),
        "auto_wall_s": round(auto_s, 3),
        "log_evidence_auto": round(float(diags["log_evidence"]), 3),
        "log_evidence_scan": round(float(diags_s["log_evidence"]), 3),
        "evidence_gap": round(abs(float(diags["log_evidence"])
                                  - float(diags_s["log_evidence"])), 3),
        "final_ess_auto": round(float(state.ess), 1),
    }
    print(json.dumps({"lr_dispatch": out["banknotes_lr"]}), flush=True)

    # -- bimodal mixture (DistributionModel + generic vg) --
    mu, s, base_scale = 3.0, 0.25, 3.0

    def log_mix(t):
        d1 = t - jnp.asarray([mu, 0.0])
        d2 = t + jnp.asarray([mu, 0.0])
        c = -jnp.log(2 * jnp.pi * s * s) - jnp.log(2.0)
        return jnp.logaddexp(c - 0.5 * jnp.dot(d1, d1) / (s * s),
                             c - 0.5 * jnp.dot(d2, d2) / (s * s))

    def base_log_pdf(t):
        return (-jnp.log(2 * jnp.pi * base_scale ** 2)
                - 0.5 * jnp.dot(t, t) / base_scale ** 2)

    dm = DistributionModel(lambda t, x, y: log_mix(t), num_params=2)
    smc2 = SMCSampler(dm, num_particles=N, betas="adaptive",
                      num_mutation_steps=MSTEPS, mutation="MALA",
                      mutation_step=0.05, max_stages=60,
                      init_sampler=lambda k, n: base_scale
                      * jax.random.normal(k, (n, 2)),
                      base_log_pdf=base_log_pdf)
    data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
    cb2, reason2 = resolve_smc(smc2, data)
    assert cb2 is not None, reason2
    key2 = jax.random.PRNGKey(2)
    state2, diags2 = smc2.run(key2, data)         # compile (generic vg!)
    t0 = time.perf_counter()
    state2, diags2 = smc2.run(key2, data)
    auto2_s = time.perf_counter() - t0
    w = np.asarray(jax.nn.softmax(jnp.asarray(state2.log_weights)),
                   np.float64)
    p = np.asarray(state2.particles, np.float64)
    right_mass = float(w[p[:, 0] > 0].sum())
    out["bimodal_mixture"] = {
        "chain_block": cb2,
        "stages": int(diags2["num_stages"]),
        "auto_wall_s": round(auto2_s, 3),
        "log_evidence": round(float(diags2["log_evidence"]), 4),
        "true_log_evidence": 0.0,
        "evidence_abs_err": round(abs(float(diags2["log_evidence"])), 4),
        "right_mode_mass": round(right_mass, 4),
        "generic_vg_path": True,
    }
    print(json.dumps({"mixture_dispatch": out["bimodal_mixture"]}),
          flush=True)

    existing = json.loads(OUT_PATH.read_text()) if OUT_PATH.exists() else {}
    existing["public_api_dispatch"] = out
    OUT_PATH.write_text(json.dumps(existing, indent=2) + "\n")
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    existing = {}
    if OUT_PATH.exists():
        existing = json.loads(OUT_PATH.read_text())
    if which in ("lr", "all"):
        existing["banknotes_lr"] = lr_case()
    if which in ("mixture", "all"):
        existing["bimodal_mixture"] = mixture_case()
    OUT_PATH.write_text(json.dumps(existing, indent=2) + "\n")
    if which in ("dispatch",):
        dispatch_case()


if __name__ == "__main__":
    main()
