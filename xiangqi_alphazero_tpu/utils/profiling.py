"""Profiling utilities: phase timers + jax.profiler trace helper.

Replaces the reference's manually unrolled benchmark harness
(reference: training/benchmark.py:18-153) with wall-clock phase timers
around jitted programs (device-synced) and an optional on-disk
``jax.profiler`` trace for per-op TPU analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Timer:
    """Accumulating phase timer; call .phase(name) around device work."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[jax.Array] = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total
            bar = "#" * int(pct / 2.5)
            lines.append(
                f"{name:<28s} {t:9.3f}s {pct:5.1f}% x{self.counts[name]:<6d} {bar}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def phase_profile(trace_dir: Optional[str] = None, device_only: bool = True):
    """Wrap a region in a jax.profiler trace when trace_dir is given.

    ``device_only`` (default) turns host/python tracing OFF: a multi-phase
    capture floods the chrome-trace with ~1M host events, hitting the
    exporter's event cap and silently DROPPING the device stream — exactly
    the stream ``trace_tools`` aggregates. Pass ``device_only=False`` to
    keep the host timeline (dispatch-gap / python-overhead analysis) on a
    capture small enough to fit.
    """
    if trace_dir:
        opts = None
        if device_only:
            opts = jax.profiler.ProfileOptions()
            opts.host_tracer_level = 0
            opts.python_tracer_level = 0
        with jax.profiler.trace(trace_dir, profiler_options=opts):
            yield
    else:
        yield
