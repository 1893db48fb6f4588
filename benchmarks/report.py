"""Full benchmark report: the five BASELINE.md configs on the local
accelerator, with samples/s, ESS/s, acceptance, and posterior moments, plus
chain-axis scaling efficiency on a virtual device mesh.

Writes benchmarks/RESULTS.md. Run on the TPU (default platform) or CPU.
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
from eeyore_tpu.samplers import HMC, MALA, Gibbs, MetropolisHastings, SMCSampler
from eeyore_tpu.samplers.runner import run_fn
from eeyore_tpu.tuners.dual_averaging import HMCDATuner

DT = jnp.float32


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


def run_config(kernel, data, num_chains, num_iters, burnin, ess_chains=32):
    """Compile, run, time; compute ESS on a chain subsample (host f64)."""
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

    kept = num_iters - burnin
    samples = np.asarray(rec["sample"][:ess_chains], dtype=np.float64)  # [c, kept, p]
    acc = np.asarray(rec["accepted"], dtype=np.float64)
    ess = []
    for c in range(samples.shape[0]):
        try:
            ess.append(st.multi_ess(samples[c], method="inse"))
        except RuntimeError:
            pass
    mean_ess = float(np.mean(ess)) if ess else float("nan")
    sps = num_chains * num_iters / elapsed
    # ESS/s: per-chain ESS earned over the whole wall-clock, all chains
    ess_per_s = mean_ess * num_chains / elapsed
    pooled = samples.reshape(-1, samples.shape[-1])
    return {
        "samples_per_s": sps,
        "ess_per_s": ess_per_s,
        "mean_chain_ess": mean_ess,
        "kept_iters": kept,
        "acceptance": float(acc.mean()),
        "posterior_mean_head": np.round(pooled.mean(0)[:4], 3).tolist(),
        "elapsed_s": elapsed,
        "num_chains": num_chains,
    }


def config1_mh(C=32768, T=2048, burnin=1024):
    model = mlp_model([2, 2, 1])
    return run_config(MetropolisHastings(model, scale=0.1), xor_data(), C, T, burnin)


def config2_mala(C=32768, T=2048, burnin=1024):
    model = mlp_model([2, 3, 2, 1])
    return run_config(MALA(model, step=0.01), xor_data(), C, T, burnin)


def config3_hmc_da(C=8192, T=1536, burnin=512):
    model = mlp_model([4, 3, 3], loss="multiclass_classification",
                      acts=[mlp.sigmoid, None])
    kern = HMC(model, tuner=HMCDATuner(l=0.15, e0=0.02), max_num_steps=64)
    return run_config(kern, iris_data(), C, T, burnin)


def config4_gibbs(C=8192, T=1024, burnin=512):
    model = mlp_model([4, 3, 2, 3], loss="multiclass_classification",
                      acts=[mlp.sigmoid, mlp.sigmoid, None])
    return run_config(Gibbs(model, scales=0.1), iris_data(), C, T, burnin)


def config5_smc(N=16384):
    x, y = xor_data()
    model = mlp_model([2, 2, 1])
    betas = [(i / 20) ** 4 for i in range(21)]
    smc = SMCSampler(model, num_particles=N, betas=betas, mutation="MALA",
                     mutation_step=0.05, num_mutation_steps=5)
    state, diags = smc.run(jax.random.PRNGKey(0), (x, y))  # compile
    t0 = time.perf_counter()
    state, diags = smc.run(jax.random.PRNGKey(1), (x, y))
    elapsed = time.perf_counter() - t0
    stages = len(betas) - 1
    return {
        "particle_stage_mutations_per_s": N * stages * 5 / elapsed,
        "final_weight_ess": float(state.ess),
        "log_evidence": diags["log_evidence"],
        "mean_mutation_acceptance": float(np.mean(diags["mutation_acceptance"])),
        "num_resamples": int(np.sum(diags["resampled"])),
        "elapsed_s": elapsed,
        "num_particles": N,
    }


def scaling_efficiency():
    """Chain-axis scaling evidence on the virtual 8-device CPU mesh.

    The virtual devices share the host's physical cores, so wall-clock
    "efficiency" there is scheduling noise (we record it anyway, labeled as a
    proxy). The sound, hardware-independent statement is structural and is
    what we verify first: the compiled sharded program contains ZERO
    collective ops — each chip runs a purely local program on its chain
    shard, so weak scaling on real hardware is linear by construction
    (tests/test_sharding_hlo.py pins this in CI).
    """
    import subprocess

    code = r"""
import os, time, json
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from eeyore_tpu.models import MLP, loss_functions, mlp
from eeyore_tpu.parallel import sample_chains_sharded
from eeyore_tpu.samplers import HMC
from eeyore_tpu.samplers.runner import run_fn
from eeyore_tpu.datasets import as_schedule
x = jnp.asarray([[0.,0.],[0.,1.],[1.,0.],[1.,1.]], dtype=jnp.float32)
y = jnp.asarray([[0.],[1.],[1.],[0.]], dtype=jnp.float32)
model = MLP(loss=loss_functions["binary_classification"], hparams=mlp.Hyperparameters(dims=[2,2,1]), dtype=jnp.float32)

# structural proof: compiled HLO of the 8-way sharded run has no collectives
mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("chains",))
kern = HMC(model, step=0.05, num_steps=10); kern.recompute_current = False
sharding = NamedSharding(mesh8, P("chains"))
keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), 16), sharding)
t0s = jax.device_put(0.1*jax.random.normal(jax.random.PRNGKey(0), (16, model.num_params), dtype=jnp.float32), sharding)
text = jax.jit(jax.vmap(run_fn(kern, as_schedule((x, y)), 8, 4, ("sample",)))).lower(keys, t0s).compile().as_text()
n_collectives = sum(text.count(c) for c in ("all-reduce","all-gather","collective-permute","all-to-all","reduce-scatter"))

out = {}
for n_dev in [1, 2, 4, 8]:
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("chains",))
    C = 1024 * n_dev
    kern = HMC(model, step=0.05, num_steps=10)
    key = jax.random.PRNGKey(0)
    theta0s = 0.1*jax.random.normal(key, (C, model.num_params), dtype=jnp.float32)
    rec, _ = sample_chains_sharded(kern, key, theta0s, (x, y), 128, 0, mesh=mesh)
    jax.block_until_ready(rec["sample"])
    best = 0.0
    for _ in range(3):
        t0=time.perf_counter()
        rec, _ = sample_chains_sharded(kern, key, theta0s, (x, y), 128, 0, mesh=mesh)
        jax.block_until_ready(rec["sample"])
        best = max(best, C*128/(time.perf_counter()-t0))
    out[n_dev] = best
base = out[1]
res = {str(k): {"sps": v, "efficiency_proxy": v/(base*k)} for k, v in out.items()}
res["hot_loop_collective_ops"] = n_collectives
print(json.dumps(res))
"""
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=1800, cwd=str(Path(__file__).resolve().parent.parent))
    lines = [l for l in res.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else {"error": res.stderr[-500:]}


def main():
    if "--md-only" in sys.argv:   # rebuild RESULTS.md from the saved JSONs
        results = json.loads((Path(__file__).parent / "RESULTS.json").read_text())
        write_md(results)
        return

    platform = jax.devices()[0].platform
    results = {"platform": platform, "device": str(jax.devices()[0])}
    for name, fn in [("config1_mh_mlp221_xor", config1_mh),
                     ("config2_mala_mlp2321_xor", config2_mala),
                     ("config3_hmc_da_mlp433_iris", config3_hmc_da),
                     ("config4_gibbs_mlp4323_iris", config4_gibbs),
                     ("config5_smc_mlp221_xor", config5_smc)]:
        t0 = time.time()
        results[name] = fn()
        print(f"{name}: {json.dumps(results[name])} (total {time.time()-t0:.0f}s incl compile)",
              flush=True)
    results["chain_scaling_virtual_mesh"] = scaling_efficiency()
    print("scaling:", json.dumps(results["chain_scaling_virtual_mesh"]), flush=True)

    out = Path(__file__).parent / "RESULTS.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    write_md(results)


def write_md(results):
    baseline = json.loads((Path(__file__).parent / "baseline_cpu.json").read_text())
    md = ["# Benchmark results", "",
          f"Device: {results['device']} ({results['platform']})", "",
          "| config | samples/s | ESS/s | acceptance | vs reference CPU |",
          "|---|---|---|---|---|"]
    ref_map = {"config1_mh_mlp221_xor": "mh_mlp221_xor_f64",
               "config2_mala_mlp2321_xor": "mala_mlp433_iris_f32",
               "config3_hmc_da_mlp433_iris": "hmc_mlp433_iris_f32"}
    for name in ["config1_mh_mlp221_xor", "config2_mala_mlp2321_xor",
                 "config3_hmc_da_mlp433_iris", "config4_gibbs_mlp4323_iris"]:
        r = results[name]
        ref = baseline.get(ref_map.get(name, ""), {}).get("samples_per_s")
        ratio = f"{r['samples_per_s']/ref:,.0f}x" if ref else "-"
        md.append(f"| {name} | {r['samples_per_s']:,.0f} | {r['ess_per_s']:,.0f} | "
                  f"{r['acceptance']:.3f} | {ratio} |")
    r5 = results["config5_smc_mlp221_xor"]
    md += ["", f"SMC: {r5['particle_stage_mutations_per_s']:,.0f} particle-mutations/s, "
           f"final weight-ESS {r5['final_weight_ess']:.0f} of {r5['num_particles']}, "
           f"log-evidence {r5['log_evidence']:.2f}", "",
           "Chain-axis scaling: compiled sharded hot loop contains "
           f"{results['chain_scaling_virtual_mesh'].get('hot_loop_collective_ops', '?')} "
           "collective ops (zero communication -> linear weak scaling on real "
           "chips by construction; tests/test_sharding_hlo.py). Virtual-CPU-mesh "
           "timing proxy (shared physical cores, noise only): " +
           ", ".join(f"{k} dev: {v['efficiency_proxy']:.2f}" for k, v in
                     results["chain_scaling_virtual_mesh"].items()
                     if isinstance(v, dict))]
    md += resident_section()
    (Path(__file__).parent / "RESULTS.md").write_text("\n".join(md) + "\n")
    print("wrote RESULTS.md / RESULTS.json")


def resident_section():
    """Render the VMEM-resident kernel results (benchmarks/validate_resident.py
    output) so regenerating this report never drops them."""
    path = Path(__file__).parent / "RESIDENT_RESULTS.json"
    if not path.exists():
        return []
    rr = json.loads(path.read_text())
    md = ["", "## VMEM-resident Pallas kernel path (ops/resident_*.py)",
          "",
          "Whole sampling loop in one kernel, chain state pinned in VMEM, HBM",
          "touched once per recorded sample. Validated on device against the",
          "scanned paths: pooled posterior moments within 6-sigma cross-chain MC",
          "error, acceptance within 0.02 (benchmarks/validate_resident.json ->",
          "RESIDENT_RESULTS.json).", "",
          "| config | resident samples/s | vs scanned | resident ESS/s | vs scanned |",
          "|---|---|---|---|---|"]
    for key, r in rr.items():
        if "error" in r or "resident_sps" not in r:
            continue
        ess_ratio = (r["resident_ess_per_s"] / r["scanned_ess_per_s"]
                     if r.get("scanned_ess_per_s") else float("nan"))
        md.append(f"| {r['config']} | {r['resident_sps']:,.0f} | "
                  f"{r['speedup']:.2f}x | {r['resident_ess_per_s']:,.0f} | "
                  f"{ess_ratio:.2f}x |")
    smc = rr.get("smc", {})
    if "resident_mutations_per_s" in smc:
        md += ["",
               f"SMC with resident-kernel mutations (ops/resident_smc.py): "
               f"{smc['resident_mutations_per_s']:,.0f} particle-stage-mutations/s "
               f"({smc['speedup']:.2f}x scanned), log-evidence "
               f"{smc['resident_log_evidence']} vs {smc['scanned_log_evidence']}, "
               f"final weight-ESS {smc['resident_final_ess']:,.0f}."]
    md += dense_section()
    md += ["",
           "bench.py headline (dense chain-tile HMC, mlp221/XOR, 131072 chains,",
           "record every sample): ~483M samples/s on one v5e chip, ~4.2e6x the",
           "reference CPU. In-kernel population dual averaging (north-star iris",
           "config, sublane layout, round-4 re-measure): 45.8M samples/s at",
           "acceptance 0.64, 5-seed spread 0.75% (DENSE_RESULTS.json",
           "iris_tuned_stability); l_rounding='stochastic' guarantees the",
           "stability structurally (wall = ceil(l/e)) at ~1.2x fewer",
           "samples/s when round() would pick the lower integer."]
    md += round4_section()
    return md


def dense_section():
    """Render the dense chain-tile kernel results (benchmarks/validate_dense*.py
    output, DENSE_RESULTS.json) so regenerating the report never drops them."""
    path = Path(__file__).parent / "DENSE_RESULTS.json"
    if not path.exists():
        return []
    dr = json.loads(path.read_text())
    md = ["", "## Dense chain-tile kernels (ops/*_dense.py, sub-8-row datasets)",
          "",
          "Chains fill both sublanes and lanes (one [8, lanes] tile per scalar",
          "parameter); the data loop is unrolled with x/y folded in as",
          "compile-time constants. Validated on device like the resident path.", "",
          "| config | dense samples/s | vs comparator | moments | acceptance |",
          "|---|---|---|---|---|"]
    for section in ("validation", ):
        r = dr.get(section)
        if r and "resident_sps" in r:
            md.append(f"| {r['config']} | {r['resident_sps']:,.0f} | "
                      f"{r['speedup']:.2f}x | {r['moments_match']} | "
                      f"{r['acceptance_match']} |")
    for r in dr.get("walk_validation", {}).values():
        if "resident_sps" in r:
            md.append(f"| {r['config']} | {r['resident_sps']:,.0f} | "
                      f"{r['speedup']:.2f}x | {r['moments_match']} | "
                      f"{r['acceptance_match']} |")
    for key in ("tempering_validation", "gibbs_validation"):
        r = dr.get(key)
        if r and "resident_sps" in r:
            md.append(f"| {r['config']} | {r['resident_sps']:,.0f} | "
                      f"{r['speedup']:.2f}x | {r['moments_match']} | "
                      f"{r['acceptance_match']} |")
    t = dr.get("walk_tuner_validation")
    if t:
        line = ("In-kernel population dual averaging (dense kernels): "
                f"MH tuned to acceptance {t['mh_tuned_acceptance']} "
                f"(target {t['mh_target']}), MALA to "
                f"{t['mala_tuned_acceptance']} (target {t['mala_target']})")
        if "hmc_tuned_acceptance" in t:
            line += (f", HMC to {t['hmc_tuned_acceptance']} "
                     f"(target {t['hmc_target']})")
        md += ["", line + "."]
    return md


def round4_section():
    """Round-4 results rendered from the saved JSONs so regeneration never
    drops them (dispatch, NUTS kernels, SMC hard targets, MXU sweep)."""
    b = Path(__file__).parent
    md = ["", "## Round 4: the public API reaches the kernels", ""]

    def load(name):
        p = b / name
        return json.loads(p.read_text()) if p.exists() else None

    disp = load("DISPATCH_RESULTS.json")
    if disp:
        c1, c3 = disp.get("config1_mh_auto"), disp.get("config3_hmc_auto")
        if c1 and c3:
            md += [f"Kernel dispatch (`backend=\"auto\"` in sample_chains / the "
                   f"harness, samplers/dispatch.py): config-1 MH "
                   f"{c1['auto_sps']:,.0f} samples/s ({c1['speedup']}x its "
                   f"scanned path), config-3 iris HMC {c3['auto_sps']:,.0f} "
                   f"({c3['speedup']}x), moments + acceptance matched."]
        td = disp.get("tempering_dispatch")
        if td:
            md += [f"PowerPosteriorSampler.run even/odd ladders: "
                   f"{td['speedup']}x via the whole-ladder kernel."]
    nuts = load("DENSE_NUTS_RESULTS.json")
    if nuts:
        v = nuts.get("validation")
        if v:
            md += ["", f"Fixed-budget NUTS kernels: dense XOR "
                   f"{v['dense_sps']:,.0f} samples/s ({v['speedup']}x scanned "
                   f"fixed-budget), ESS/s {v['dense_ess_per_s']:,.0f}."]
        ir = nuts.get("iris_sublane")
        if ir:
            md += [f"Sublane iris: {ir['dense_sps']:,.0f} samples/s "
                   f"({ir['speedup']}x), zero divergences."]
        ds = nuts.get("depth_scaling_32768x512")
        if ds:
            md += ["Depth scaling (leapfrogs/s): "
                   + ", ".join(f"d{k[-1]}: {v['leapfrogs_per_s']/1e9:.2f}G"
                               for k, v in sorted(ds.items()))]
    hard = load("SMC_HARD_RESULTS.json")
    if hard and "banknotes_lr" in hard:
        lr = hard["banknotes_lr"]
        md += ["", f"Adaptive SMC, banknotes LR: "
               f"{lr['adaptive']['stages']} stages, log-evidence "
               f"{lr['adaptive']['log_evidence']} vs "
               f"{lr['fixed_quartic_30']['log_evidence']} (30-stage) vs "
               f"{lr['thermodynamic_integration']['log_z']} +- "
               f"{lr['thermodynamic_integration']['log_z_se']} (TI)."]
    if (b / "WIDE_MODEL_RESULTS.json").exists():
        md += ["Wide-model boundary: P=12730 runs the scanned engine "
               "(whole-loop residency spills past VMEM; "
               "WIDE_MODEL_RESULTS.json); dispatch gated at 256 params."]
    return md


if __name__ == "__main__":
    main()
