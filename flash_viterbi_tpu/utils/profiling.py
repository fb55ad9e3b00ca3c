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


def profile_flash(hmm, y, num_segments: int = 8, pad_to: int = 128,
                  reps: int = 3) -> dict:
    """Per-phase wall times for a FLASH decode (SURVEY.md §5: phase-1
    pass, segment decode, backtrack-and-assemble), measured with the
    chained-marginal method so the tunnel's async dispatch cannot lie.

    Phases are re-run as standalone jitted programs; their sum slightly
    exceeds the fused end-to-end decode (which overlaps them).
    """
    import time as _time
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ..algorithms import flash as F
    from ..models.hmm import LogHMM

    lh = hmm if isinstance(hmm, LogHMM) else hmm.log()
    K_logical = lh.K
    lh = lh.padded(pad_to)
    T = int(len(y))
    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi0 = jnp.asarray(lh.logPi)
    yd = jnp.asarray(np.asarray(y), jnp.int32)
    mids = F.flash_midpoints(0, T - 1, num_segments) if num_segments > 1 else []

    def marginal(fn, k1=1, k2=3):
        @partial(jax.jit, static_argnames="k")
        def chain(logA, logB, logPi, yd, k):
            out = None
            for _ in range(k):
                out = fn(logA, logB, logPi, yd)
                logPi = logPi + out.reshape(-1)[0].astype(jnp.float32) * jnp.float32(1e-30)
            return out

        int(np.asarray(chain(logA, logB, logPi0, yd, k=k1)).ravel()[0])
        int(np.asarray(chain(logA, logB, logPi0, yd, k=k2)).ravel()[0])

        def run(k):
            ts = []
            for i in range(reps):
                a = logPi0 + jnp.float32(i) * jnp.float32(1e-30)
                t0 = _time.perf_counter()
                int(np.asarray(chain(logA, logB, a, yd, k=k)).ravel()[0])
                ts.append(_time.perf_counter() - t0)
            return float(np.median(ts))

        return max((run(k2) - run(k1)) / (k2 - k1), 0.0)

    def phase1(logA, logB, logPi, yd):
        emits = logB[:, yd].T
        last, anchors = F.phase1_anchors_pallas(logA, logPi, emits, mids) \
            if jax.default_backend() == "tpu" else \
            F.phase1_anchors(logA, logPi, emits, mids)
        return jnp.concatenate([anchors, last[None]]).astype(jnp.float32)

    def full(logA, logB, logPi, yd):
        return F.flash_decode(logA, logB, logPi, yd, num_segments=num_segments)

    t_phase1 = marginal(phase1)
    t_full = marginal(full)
    return {
        "phase1_s": t_phase1,
        "phase2_and_backtrack_s": max(t_full - t_phase1, 0.0),
        "total_s": t_full,
        "trellis_updates_per_s": K_logical * K_logical * T / t_full
        if t_full > 0 else float("inf"),
        "num_segments": num_segments,
    }


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
