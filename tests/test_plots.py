"""Plotting helpers (eeyore_tpu/plots.py): the built-in replacement for the
reference's kanga plot delegation — smoke + numeric checks with the Agg
backend."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

from eeyore_tpu import plots
from eeyore_tpu.chains import ChainList

RNG = np.random.default_rng(17)


def teardown_function(_fn):
    plt.close("all")


def test_trace_and_hist_render(tmp_path):
    draws = RNG.normal(size=300)
    fig, ax = plots.trace(draws, title="t")
    assert ax.get_title() == "t"
    assert len(ax.lines) == 1
    fig.savefig(tmp_path / "trace.png")

    fig, ax = plots.hist(draws, bins=10)
    assert len(ax.patches) == 10


def test_running_mean_values():
    draws = np.array([1.0, 3.0, 5.0])
    _, ax = plots.running_mean(draws)
    np.testing.assert_allclose(ax.lines[0].get_ydata(), [1.0, 2.0, 3.0])


def test_acf_lag0_is_one():
    draws = RNG.normal(size=500)
    _, ax = plots.acf(draws, max_lag=10)
    # stem stores the heads in a Line2D collection; lag-0 autocorrelation = 1
    heads = ax.containers[0].markerline.get_ydata()
    np.testing.assert_allclose(heads[0], 1.0, atol=1e-12)


def test_chain_summary_figure():
    chain = ChainList.from_arrays({
        "sample": RNG.normal(size=(100, 3)),
        "target_val": RNG.normal(size=100),
        "accepted": np.ones(100, dtype=int),
    })
    fig = plots.chain_summary_figure(chain, params=[0, 2])
    assert len(fig.axes) == 2 * 3
