"""Profiling helpers: wall-clock phase timers and JAX device traces.

The reference's only observability is print-based wall-clock timing around
draws (serial_sampler.py:43-50); here phases are timed explicitly and an
XLA/TPU trace can be captured around any run for perfetto/tensorboard
analysis.
"""

import contextlib
import time

import jax


class PhaseTimer:
    """Accumulates named phase durations (compile vs run vs diagnostics)."""

    def __init__(self):
        self.totals = {}

    @contextlib.contextmanager
    def phase(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - start

    def report(self):
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))


@contextlib.contextmanager
def device_trace(log_dir):
    """Capture a JAX profiler trace (view with tensorboard / perfetto)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, block=True):
    """(result, seconds) with device completion included."""
    start = time.perf_counter()
    out = fn(*args)
    if block:
        jax.block_until_ready(out)
    return out, time.perf_counter() - start
