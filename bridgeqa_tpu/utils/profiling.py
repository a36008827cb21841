"""Profiling hooks: ``jax.profiler`` traces + per-phase step timers.

The reference only had manual wall-clock timing (``lib/solver.py:524-543``,
``utils/eta.py``); here we add real device traces on demand — set
``BRIDGEQA_PROFILE_DIR`` or pass ``trace_dir`` to capture XLA timelines
viewable in TensorBoard/XProf.
"""

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir=None, *, step: int = 0, enabled=None):
    """Trace the enclosed block with jax.profiler when enabled.

    enabled=None -> auto: on iff trace_dir or BRIDGEQA_PROFILE_DIR is set.
    """
    trace_dir = trace_dir or os.environ.get("BRIDGEQA_PROFILE_DIR")
    if enabled is None:
        enabled = trace_dir is not None
    if not enabled or trace_dir is None:
        yield
        return
    with jax.profiler.trace(trace_dir):
        with jax.profiler.StepTraceAnnotation("train", step_num=step):
            yield


class PhaseTimer:
    """Accumulates wall time per named phase (fetch/forward/backward/eval),
    mirroring the per-iter time report of ``solver.py:573-579``."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def means(self) -> dict:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()
