"""Chain plotting helpers: traces, running means, marginal histograms.

The reference delegates these to its sister package kanga
(/root/reference/examples/samplers/mlp/iris/mala_cpu_chainlist.py:88-117
uses kanga.plots.trace / running_mean / hist); here they are built in so a
chain can be inspected without extra dependencies. Each helper takes a 1-D
array of draws for one parameter (``chain.get_param(i)``), returns
``(fig, ax)`` and never calls ``plt.show()`` — save or display at the call
site. matplotlib is imported lazily and is the only requirement.
"""

import numpy as np


def _axes(ax, title, xlabel, ylabel):
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    if title:
        ax.set_title(title)
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    return ax.figure, ax


def trace(draws, title=None, xlabel="Iteration", ylabel="Parameter value",
          ax=None, **kwargs):
    """Trace plot of one parameter's draws."""
    draws = np.asarray(draws).reshape(-1)
    fig, ax = _axes(ax, title, xlabel, ylabel)
    ax.plot(np.arange(len(draws)), draws, linewidth=0.7, **kwargs)
    return fig, ax


def running_mean(draws, title=None, xlabel="Iteration", ylabel="Running mean",
                 ax=None, **kwargs):
    """Running-mean plot (cumulative mean per iteration)."""
    draws = np.asarray(draws, dtype=np.float64).reshape(-1)
    means = np.cumsum(draws) / np.arange(1, len(draws) + 1)
    fig, ax = _axes(ax, title, xlabel, ylabel)
    ax.plot(np.arange(len(means)), means, **kwargs)
    return fig, ax


def hist(draws, bins=30, density=True, title=None, xlabel="Parameter value",
         ylabel="Relative frequency", ax=None, **kwargs):
    """Marginal histogram of one parameter's draws."""
    draws = np.asarray(draws).reshape(-1)
    fig, ax = _axes(ax, title, xlabel, ylabel)
    ax.hist(draws, bins=bins, density=density, **kwargs)
    return fig, ax


def acf(draws, max_lag=50, title=None, xlabel="Lag",
        ylabel="Autocorrelation", ax=None, **kwargs):
    """Autocorrelation-function stem plot up to ``max_lag``."""
    draws = np.asarray(draws, dtype=np.float64).reshape(-1)
    centered = draws - draws.mean()
    denom = np.dot(centered, centered)
    lags = np.arange(min(max_lag, len(draws) - 1) + 1)
    rho = np.asarray([np.dot(centered[:len(centered) - k],
                             centered[k:]) / denom for k in lags])
    fig, ax = _axes(ax, title, xlabel, ylabel)
    markerline, stemlines, baseline = ax.stem(lags, rho, **kwargs)
    return fig, ax


def chain_summary_figure(chain, params=None, bins=30):
    """One figure per chain: rows = parameters, columns = trace / running
    mean / histogram (the reference example's three per-parameter plot loops
    in one call)."""
    import matplotlib.pyplot as plt

    samples = np.asarray(chain.get_samples())
    params = range(samples.shape[1]) if params is None else params
    params = list(params)
    fig, axes = plt.subplots(len(params), 3,
                             figsize=(12, 2.5 * len(params)), squeeze=False)
    for row, i in enumerate(params):
        draws = samples[:, i]
        trace(draws, ylabel=rf"$\theta_{{{i}}}$", ax=axes[row][0])
        running_mean(draws, ax=axes[row][1])
        hist(draws, bins=bins, ax=axes[row][2])
    fig.tight_layout()
    return fig
