"""Observability: phase timers, device traces, memory reports.

The reference's only instrumentation is one wall-clock bracket around
``calc()`` plus the analytic ``memory:`` figure every algorithm computes
for itself (SURVEY.md §5).  Here:

* :class:`PhaseTimer` — named phase brackets (phase-1 pass, segment
  rounds, backtrack...) with a structured dict/JSON export; the derived
  ``trellis updates/s`` north-star metric included.
* :func:`device_trace` — ``jax.profiler`` trace context for perfetto/
  tensorboard inspection.
* :func:`memory_report` — analytic working set (static block shapes) next
  to the live device allocation stats, the TPU analog of the reference's
  per-algorithm accounting (``src/FLASH_Viterbi_multithread.c:341-367``).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class PhaseTimer:
    """Named wall-clock phases with structured export."""

    phases: dict = field(default_factory=dict)
    _order: list = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            if name not in self._order:
                self._order.append(name)

    def report(self, K: int | None = None, T: int | None = None) -> dict:
        total = sum(self.phases.values())
        out = {"total_s": total,
               "phases": {n: self.phases[n] for n in self._order}}
        if K and T and total > 0:
            out["trellis_updates_per_s"] = K * K * T / total
        return out

    def json(self, **kw) -> str:
        return json.dumps(self.report(**kw))


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace bracket (view in tensorboard/perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_report(decoder=None, K: int | None = None, T: int | None = None) -> dict:
    """Analytic + live device memory figures."""
    import jax

    out: dict = {}
    if decoder is not None and K and T:
        out["analytic_bytes"] = decoder.analytic_memory(K=K, T=T)
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            out["device_bytes_in_use"] = stats.get("bytes_in_use")
            out["device_peak_bytes_in_use"] = stats.get("peak_bytes_in_use")
            out["device_bytes_limit"] = stats.get("bytes_limit")
    except Exception:
        pass
    out["live_array_bytes"] = int(sum(
        int(np.prod(a.shape)) * a.dtype.itemsize for a in jax.live_arrays()))
    return out
