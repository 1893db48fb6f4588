"""At-scale run monitoring: acceptance / step-size / energy summaries over
thousands of chains (the north-star "acceptance-rate monitoring and
step-size/mass-matrix tuning" observability surface; the reference only
prints per-chain acceptance post-hoc, chain_list.py:94-99).

Works on the raw recorded arrays from sample_chains(..., return_arrays=True)
or a ChainLists, plus final kernel states for tuner settings.
"""

import numpy as np


def _get(arrays, key):
    if hasattr(arrays, "tensor"):  # ChainLists
        v = arrays.tensor(key) if key in arrays.keys() else None
        return None if v is None else np.asarray(v)
    v = arrays.get(key)
    return None if v is None else np.asarray(v)


def summarize_run(arrays, state=None, quantiles=(0.05, 0.5, 0.95)):
    """Cross-chain summary: acceptance quantiles, per-chain acceptance
    outliers, target-value spread, tuned step / trajectory stats."""
    out = {}
    accepted = _get(arrays, "accepted")
    if accepted is not None:
        if accepted.ndim == 3:  # blocked Gibbs: [chains, iters, blocks]
            rates = accepted.mean(axis=1)
            out["block_acceptance_mean"] = rates.mean(axis=0).tolist()
            rates = rates.mean(axis=1)
        else:
            rates = accepted.mean(axis=1)
        out["acceptance_quantiles"] = {
            f"q{int(q*100)}": float(np.quantile(rates, q)) for q in quantiles}
        out["acceptance_mean"] = float(rates.mean())
        out["num_stuck_chains"] = int(np.sum(rates < 0.01))

    accept_stat = _get(arrays, "accept_stat")
    if accept_stat is not None:
        # Like-for-like Metropolis acceptance for kernels (NUTS) whose
        # `accepted` means "sample moved" rather than "proposal accepted".
        out["accept_stat_mean"] = float(accept_stat.mean())

    target = _get(arrays, "target_val")
    if target is not None:
        finals = target[:, -1]
        out["final_target_quantiles"] = {
            f"q{int(q*100)}": float(np.quantile(finals, q)) for q in quantiles}
        out["num_diverged_chains"] = int(np.sum(~np.isfinite(finals)))

    if state is not None:
        step = getattr(state, "step", None)
        if step is not None:
            step = np.asarray(step)
            out["tuned_step"] = {
                "mean": float(step.mean()),
                "min": float(step.min()),
                "max": float(step.max()),
            }
        num_steps = getattr(state, "num_steps", None)
        if num_steps is not None:
            num_steps = np.asarray(num_steps)
            out["tuned_num_steps"] = {
                "mean": float(num_steps.mean()),
                "max": int(num_steps.max()),
            }
    return out
