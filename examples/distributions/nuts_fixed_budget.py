"""Fixed-budget NUTS at chain scale: static-control-flow no-u-turn
trajectories that draw BIT-IDENTICAL samples to adaptive NUTS at the same
max_depth, without the vmapped-while_loop lockstep penalty.

Under vmap, adaptive NUTS makes every chain wait for the deepest chain's
tree each transition (~190x slowdown at 32k chains). ``fixed_budget=True``
executes exactly 2^max_depth - 1 leapfrogs as unrolled doublings +
fori_loop subtrees with masked early-stopping algebra — 158x faster at 32k
chains on TPU with per-sample ESS ratio 1.0 (benchmarks/NUTS_RESULTS.json).

Run: python examples/distributions/nuts_fixed_budget.py  (CPU-friendly size)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.models import DistributionModel
from eeyore_tpu.samplers import NUTS, sample_chains

cov = np.array([[1.0, 0.8], [0.8, 1.0]])
prec = jnp.asarray(np.linalg.inv(cov))
model = DistributionModel(lambda t, x, y: -0.5 * t @ prec @ t, num_params=2)
data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))

key = jax.random.PRNGKey(0)
theta0s = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (256, 2))

adaptive = NUTS(model, step=0.4, max_depth=4)
fixed = NUTS(model, step=0.4, max_depth=4, fixed_budget=True)

rec_a = sample_chains(adaptive, key, theta0s, data, num_iters=500,
                      num_burnin_iters=100, return_arrays=True)
rec_f = sample_chains(fixed, key, theta0s, data, num_iters=500,
                      num_burnin_iters=100, return_arrays=True)

same = np.array_equal(np.asarray(rec_a["sample"]), np.asarray(rec_f["sample"]))
pooled = np.asarray(rec_f["sample"], dtype=np.float64).reshape(-1, 2)
print(f"bit-identical to adaptive NUTS: {same}")
print(f"pooled mean: {pooled.mean(0).round(3)} (true [0, 0])")
print(f"pooled cov diag: {pooled.var(0).round(3)} (true [1, 1])")
print(f"mean tree depth: {np.asarray(rec_f['depth']).mean():.2f}, "
      f"mean leapfrogs/transition: {np.asarray(rec_f['num_leapfrogs']).mean():.2f} "
      f"(budget 15)")
assert same

# Round 4: let the framework pick the frozen budget — a short adaptive
# warmup freezes max_depth at the p95 kept treedepth and returns the tuned
# step. (On TPU with an architecture-generated model — MLP / logistic
# regression — the fixed-budget kernel then dispatches to the whole-loop
# Pallas NUTS kernels automatically: 597M samples/s dense / 22M sublane,
# benchmarks/DENSE_NUTS_RESULTS.json.)
from eeyore_tpu.samplers import choose_max_depth

depth, step = choose_max_depth(model, data, step=0.4, num_warmup=200,
                               theta0s=theta0s[:8], key=jax.random.PRNGKey(2))
print(f"choose_max_depth: frozen depth {depth}, tuned step {step:.3f}")
auto = NUTS(model, step=step, max_depth=depth, fixed_budget=True)
rec = sample_chains(auto, jax.random.PRNGKey(3), theta0s, data,
                    num_iters=500, num_burnin_iters=100, return_arrays=True)
pooled2 = np.asarray(rec["sample"], dtype=np.float64).reshape(-1, 2)
print(f"auto-budget pooled mean: {pooled2.mean(0).round(3)} (true [0, 0])")

# Round 5: the probe is built in — max_depth="auto" runs choose_max_depth
# the first time the kernel sees data (inside sample_chains), freezes
# (depth, step), and on TPU dispatches straight onto the fixed-budget
# Pallas kernels with no further ceremony
# (benchmarks/AUTO_NUTS_RESULTS.json: 409M samples/s on XOR through this
# exact one-liner path).
auto2 = NUTS(model, step=0.4, max_depth="auto")
# prior-less DistributionModel: give the probe its inits (MLP/logistic
# models draw them from the prior automatically)
auto2.resolve_auto_budget(data, key=jax.random.PRNGKey(4), num_warmup=200,
                          theta0s=theta0s[:8])
print(f"max_depth='auto': probed depth {auto2.max_depth}, "
      f"step {auto2.step0:.3f}")
rec3 = sample_chains(auto2, jax.random.PRNGKey(5), theta0s, data,
                     num_iters=500, num_burnin_iters=100, return_arrays=True)
pooled3 = np.asarray(rec3["sample"], dtype=np.float64).reshape(-1, 2)
print(f"max_depth='auto' pooled mean: {pooled3.mean(0).round(3)} (true [0, 0])")
