"""Round-5 candidate closure: sublane NUTS depth scaling on iris, in ESS/s.

Round 4 measured depth-3 iris NUTS at 22.0M samples/s and 865k ESS/s
(DENSE_NUTS_RESULTS.json iris_sublane) vs resident HMC's 21.3M / 773k.
The capped auto probe (round 5) freezes depth 4 on iris — half the sample
rate (15 leapfrogs vs 7). This measures whether the deeper trees' longer
trajectories buy the ESS back: depth {3, 4} at the SAME probed step, ESS
on a 64-chain subset (INSE), ESS/s comparison.

Writes benchmarks/NUTS_DEPTH_ESS.json. TPU.
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

from validate_resident import iris_data, mlp_model  # noqa: E402

from eeyore_tpu import stats as st  # noqa: E402
from eeyore_tpu.models import mlp as mlp_mod  # noqa: E402
from eeyore_tpu.samplers import NUTS, sample_chains  # noqa: E402
from eeyore_tpu.tuners.dual_averaging import HMCDATuner  # noqa: E402

C, T, BURN = 16384, 2048, 1024
OUT = Path(__file__).parent / "NUTS_DEPTH_ESS.json"


def main():
    xi, yi = iris_data()
    data = (np.asarray(xi), np.asarray(yi))
    model = mlp_model([4, 3, 3], loss="multiclass_classification",
                      acts=[mlp_mod.sigmoid, None])
    key = jax.random.PRNGKey(0)
    theta0s = 0.1 * jax.random.normal(key, (C, model.num_params), jnp.float32)

    # probe once (same config the auto flow uses -> warm compile cache)
    probe = NUTS(model, step=0.1, max_depth="auto", tuner=HMCDATuner(d=0.8))
    probe.resolve_auto_budget(data, key=key)
    step = probe.step0
    results = {"probed": {"depth": probe.max_depth,
                          "step": round(float(step), 5)}}

    for depth in (3, 4):
        kernel = NUTS(model, step=step, max_depth=depth, fixed_budget=True,
                      tuner=HMCDATuner(d=0.8, e0=step))
        kw = dict(record_keys=("sample",), return_arrays=True, backend="auto")
        rec = sample_chains(kernel, key, theta0s, data, T, BURN, **kw)
        jax.block_until_ready(rec["sample"])
        t0 = time.perf_counter()
        rec = sample_chains(kernel, key, theta0s, data, T, BURN, **kw)
        jax.block_until_ready(rec["sample"])
        wall = time.perf_counter() - t0
        sub = np.asarray(rec["sample"][:64], np.float64)
        ess = []
        for c in range(64):
            try:
                ess.append(st.multi_ess(sub[c], method="inse"))
            except RuntimeError:
                pass
        mean_ess = float(np.mean(ess))
        sps = C * T / wall
        results[f"depth{depth}"] = {
            "samples_per_s": round(sps, 1),
            "mean_chain_ess": round(mean_ess, 1),
            "ess_per_s": round(mean_ess * C / wall, 1),
            "leapfrogs": 2 ** depth - 1,
        }
        print(json.dumps({f"depth{depth}": results[f"depth{depth}"]}),
              flush=True)

    d3, d4 = results["depth3"], results["depth4"]
    results["depth4_over_depth3_ess_per_s"] = round(
        d4["ess_per_s"] / d3["ess_per_s"], 3)
    print(json.dumps({"ratio": results["depth4_over_depth3_ess_per_s"]}))
    OUT.write_text(json.dumps(results, indent=2) + "\n")




def ess_criterion_check():
    """criterion='ess' end-to-end: the probe must pick the measured
    ESS/s-optimal depth on iris (2, per the table above) and the kernel at
    that depth must deliver the corresponding ESS/s through the public
    API."""
    xi, yi = iris_data()
    data = (np.asarray(xi), np.asarray(yi))
    model = mlp_model([4, 3, 3], loss="multiclass_classification",
                      acts=[mlp_mod.sigmoid, None])
    key = jax.random.PRNGKey(0)
    kernel = NUTS(model, step=0.1, max_depth="auto", tuner=HMCDATuner(d=0.8))
    t0 = time.perf_counter()
    kernel.resolve_auto_budget(data, key=key, criterion="ess")
    probe_s = time.perf_counter() - t0
    out = {"chosen_depth": kernel.max_depth,
           "step": round(float(kernel.step0), 5),
           "probe_wall_s": round(probe_s, 2)}
    theta0s = 0.1 * jax.random.normal(key, (C, model.num_params), jnp.float32)
    kw = dict(record_keys=("sample",), return_arrays=True, backend="auto")
    rec = sample_chains(kernel, key, theta0s, data, T, BURN, **kw)
    jax.block_until_ready(rec["sample"])
    t0 = time.perf_counter()
    rec = sample_chains(kernel, key, theta0s, data, T, BURN, **kw)
    jax.block_until_ready(rec["sample"])
    wall = time.perf_counter() - t0
    sub = np.asarray(rec["sample"][:64], np.float64)
    ess = [st.multi_ess(sub[c], method="inse") for c in range(64)]
    out["samples_per_s"] = round(C * T / wall, 1)
    out["ess_per_s"] = round(float(np.mean(ess)) * C / wall, 1)
    print(json.dumps({"ess_criterion": out}), flush=True)
    d = json.loads(OUT.read_text()) if OUT.exists() else {}
    d["ess_criterion"] = d_out = out
    OUT.write_text(json.dumps(d, indent=2) + "\n")


if __name__ == "__main__" and "--ess" in sys.argv:
    ess_criterion_check()
    sys.exit(0)


if __name__ == "__main__":
    main()
