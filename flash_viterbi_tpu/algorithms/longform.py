"""Host-phased FLASH decode for dispatch-bounded environments (config-5).

The axon TPU tunnel enforces a per-dispatch execution ceiling (~2 min of
device time; measured 2026-08-19: a benign 600-chunk fused scan at
K=16384 — ~180 s — reproducibly crashes the worker with "TPU worker
process crashed or restarted", while the same program at half length
runs; see results/ROUND3.md).  A single-dispatch decode of the config-5
shape (K=16384, T=65536: ~85 s phase 1 + ~40 s phase 2 per sequence)
cannot fit, so this module runs FLASH pointer mode as a sequence of
bounded dispatches driven from the host:

* **phase 1**: the fused forward scan runs in groups of ``group_steps``
  trellis steps (one dispatch each, ~5 s at config-5 scale); each group
  returns its pointer rows, kept on device.  Splitting a scan at a carry
  boundary is the identical computation, so the pointer table is
  bit-identical to the one-dispatch scan's.
* **anchors**: the group parts are walked in reverse with the
  chunk-streamed Pallas backtrack, chaining boundary states — the
  plane-fold identity (``algorithms.flash.phase1_anchors_pallas``):
  anchors == path positions at the segment boundaries.
* **phase 2**: the N forced-boundary segments re-run their DP (the
  reference's restart semantics, ``FLASH_Viterbi_multithread.c:204-262``)
  as one N-lane chunked scan, again in bounded groups, walked part-wise.

Emissions are gathered from the (M, K) table per chunk (never a (T, K)
materialization — 4.3 GB at config-5).  Bit-identical to
``flash.flash_decode(mode="pointer")`` wherever both run
(tests/test_longform.py pins this on CPU interpret).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.pallas.backtrack import (argmax_walk_pallas,
                                    argmax_walk_supported,
                                    backtrack_pallas_batched)
from ..ops.pallas.maxplus import maxplus_scan, maxplus_scan_deltas
from .flash import flash_midpoints, segment_layout

_CHUNK = 512  # steps per maxplus_scan call inside a group dispatch


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "interpret", "recompute"))
def _scan_group(logA, logBT, y_seg, d, n_steps: int, interpret: bool,
                recompute: bool = False):
    """One bounded dispatch: n_steps trellis steps for the (N, K) carry.

    y_seg: (N, n_steps) symbols for steps j..j+n_steps-1.
    Returns (d', parts (n_steps, N, K)) — int32 pointer rows, or the f32
    carry history when ``recompute`` (the argmax-on-backtrack pipeline).
    """
    N, K = d.shape
    scan_fn = maxplus_scan_deltas if recompute else maxplus_scan

    def one(dd, c0):
        sym = jax.lax.dynamic_slice(
            y_seg, (0, c0), (N, min(_CHUNK, n_steps)))
        emits = jnp.transpose(logBT[sym], (1, 0, 2))
        return scan_fn(logA, emits, dd, interpret=interpret)

    if n_steps <= _CHUNK:
        return one(d, 0)
    full = n_steps // _CHUNK
    d, stacked = jax.lax.scan(
        lambda dd, c0: one(dd, c0), d, _CHUNK * jnp.arange(full))
    parts = [stacked.reshape(full * _CHUNK, N, K)]
    rem = n_steps - full * _CHUNK
    if rem:
        sym = jax.lax.dynamic_slice(y_seg, (0, full * _CHUNK), (N, rem))
        emits = jnp.transpose(logBT[sym], (1, 0, 2))
        d, ptrs = scan_fn(logA, emits, d, interpret=interpret)
        parts.append(ptrs)
    return d, jnp.concatenate(parts) if len(parts) > 1 else parts[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _walk_part(ptrs, state, interpret: bool):
    return backtrack_pallas_batched(ptrs, state, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _walk_part_recompute(deltas, logAT, state, valid, interpret: bool):
    return argmax_walk_pallas(deltas, logAT, state, valid=valid,
                              interpret=interpret)


def _walk_chain(parts, state, interpret: bool, logAT=None, valids=None):
    """Reverse-chained walk over a list of parts; returns the full path
    (N, total_steps + 1) including the start state.  Pointer parts walk
    on the backtrack kernel; with ``logAT`` the parts are carry histories
    and walk on the recompute kernel (``valids``: per-part masks or
    None)."""
    pieces = []
    for i, pt in enumerate(reversed(parts)):
        if logAT is None:
            w = _walk_part(pt, state, interpret)
        else:
            v = None if valids is None else valids[len(parts) - 1 - i]
            w = _walk_part_recompute(pt, logAT, state, v, interpret)
        pieces.append(np.asarray(w[:, 1:]))
        state = w[:, 0]
    pieces.append(np.asarray(state)[:, None])
    return np.concatenate(pieces[::-1], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _d0_phase1(logA, logBT, logPi, sym0, interpret: bool):
    return (logPi + logBT[sym0])[None, :]


@jax.jit
def _mask_part(ptrs, valid):
    """Identity pointer rows where invalid (padding steps of ragged
    segments): (n, N, K) ptrs, (n, N) valid."""
    K = ptrs.shape[2]
    iota = jnp.arange(K, dtype=jnp.int32)
    return jnp.where(valid[:, :, None], ptrs, iota[None, None, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _d0_phase2(logA, logBT, logPi, entries, first, sym0, interpret: bool):
    NL = entries.shape[0]
    K = logA.shape[0]
    return (jnp.where(first[:, None], jnp.broadcast_to(logPi, (NL, K)),
                      logA[entries])
            + logBT[sym0])


def flash_decode_long(logA, logB, logPi, y, num_segments: int = 4,
                      group_steps: int = 4096,
                      interpret: bool | str = "auto") -> np.ndarray:
    """FLASH pointer-mode decode as bounded host-phased dispatches.

    Same decode as ``flash.flash_decode(..., mode="pointer")`` (pointer
    tables, forced-boundary segment restarts) but no single device
    dispatch exceeds ~``group_steps`` trellis steps.  Returns the (T,)
    int64 path.
    """
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    interpret = bool(interpret)
    y = np.asarray(y, np.int32)
    T = len(y)
    K = logA.shape[0]
    logBT = jnp.transpose(logB)
    N = int(num_segments)
    if N < 1 or T < 2 * N:
        N = max(1, min(N, T // 2)) or 1
    mids = flash_midpoints(0, T - 1, N) if N > 1 else []

    # ---- phase 1: grouped forward scan, pointer parts kept on device ----
    yd = jnp.asarray(y)[None, :]  # (1, T)
    d = _d0_phase1(logA, logBT, logPi, yd[0, 0], interpret)
    parts = []
    j = 1
    while j < T:
        n = min(group_steps, T - j)
        y_seg = jax.lax.dynamic_slice(yd, (0, j), (1, n))
        d, ptrs = _scan_group(logA, logBT, y_seg, d, n_steps=n,
                              interpret=interpret)
        parts.append(ptrs)
        j += n
    last = int(np.asarray(jnp.argmax(d[0])))
    if not mids:
        path = _walk_chain(parts, jnp.asarray([last], jnp.int32), interpret)
        return path[0].astype(np.int64)

    path1 = _walk_chain(parts, jnp.asarray([last], jnp.int32), interpret)[0]
    anchors = path1[np.asarray(mids)]
    del parts, path1

    # ---- phase 2: N-lane forced-boundary segment restart, grouped ------
    # Ragged segments use the masked-Lmax layout of
    # flash.decode_segments_pointer_pallas: steps past a segment's true
    # length read clamped symbols and their pointer rows are fixed to the
    # identity afterwards, so a uniform walk works.
    starts, lens, Lmax = segment_layout(mids, T)
    starts_np = np.asarray(starts)
    lens_np = np.asarray(lens)
    idx = np.minimum(starts_np[:, None] + np.arange(Lmax)[None, :], T - 1)
    seg_sym = jnp.asarray(y[idx])  # (N, Lmax)
    entries = jnp.asarray(np.concatenate([[0], anchors]), jnp.int32)
    exits = jnp.asarray(np.concatenate([anchors, [last]]), jnp.int32)
    first = jnp.asarray(np.arange(N) == 0)
    d = _d0_phase2(logA, logBT, logPi, entries, first, seg_sym[:, 0],
                   interpret)
    # recompute-on-backtrack when supported (bit-identical; ~2x the
    # VPU-bound N-lane scan — algorithms/fused.py); ragged steps are
    # masked in the walk (recompute) or as identity pointer rows (store)
    recompute = argmax_walk_supported(N, K)
    logAT = jnp.transpose(logA) if recompute else None
    parts = []
    valids = []
    j = 1
    while j < Lmax:
        n = min(group_steps, Lmax - j)
        y_seg = jax.lax.dynamic_slice(seg_sym, (0, j), (N, n))
        d, ptrs = _scan_group(logA, logBT, y_seg, d, n_steps=n,
                              interpret=interpret, recompute=recompute)
        # steps beyond each segment's true length keep the lane state
        valid = jnp.asarray(
            (j + np.arange(n))[:, None] <= (lens_np - 1)[None, :])
        if recompute:
            parts.append(ptrs)
            valids.append(valid)
        else:
            parts.append(_mask_part(ptrs, valid))
        j += n
    seg_paths = _walk_chain(parts, exits, interpret,
                            logAT=logAT,
                            valids=valids if recompute else None)  # (N, Lmax)
    out = np.zeros(T, np.int64)
    for s in range(N):
        out[starts_np[s]:starts_np[s] + lens_np[s]] = \
            seg_paths[s, :lens_np[s]]
    return out


def flash_decode_long_batch(logA, logB, logPi, ys, num_segments: int = 4,
                            group_steps: int = 4096,
                            interpret: bool | str = "auto",
                            batched: bool | str = "auto") -> np.ndarray:
    """Batch driver.  ``batched`` (default auto, on when the recompute
    walk supports the shape) runs :func:`flash_decode_long_batched` — one
    logA stream serves the whole batch (~Bs× less phase-1 HBM traffic);
    otherwise sequences decode one at a time."""
    ys = np.asarray(ys, np.int32)
    if batched == "auto":
        batched = ys.shape[0] > 1 and argmax_walk_supported(1, logA.shape[0])
    if batched:
        return flash_decode_long_batched(logA, logB, logPi, ys,
                                         num_segments=num_segments,
                                         group_steps=group_steps,
                                         interpret=interpret)
    return np.stack([
        flash_decode_long(logA, logB, logPi, ys[b],
                          num_segments=num_segments,
                          group_steps=group_steps, interpret=interpret)
        for b in range(ys.shape[0])
    ])


from .base import Decoder, register  # noqa: E402  (registry import cycle-safe)
from .flash import _memory as _flash_memory  # noqa: E402


@register("flash_long")
def _build(num_segments: int = 4, group_steps: int = 4096,
           **static) -> Decoder:
    """Public registration: ``algorithm="flash_long"`` — FLASH pointer
    mode as bounded host-phased dispatches (config-5-class shapes whose
    single dispatch would exceed the environment's execution ceiling).
    Host-driven (``jittable=False``), same reference-exact memory
    accounting as flash pointer mode."""

    def fn(logA, logB, logPi, y):
        import jax.numpy as jnp

        return jnp.asarray(
            flash_decode_long(logA, logB, logPi, np.asarray(y),
                              num_segments=num_segments,
                              group_steps=group_steps))

    def batch_fn(logA, logB, logPi, ys):
        import jax.numpy as jnp

        return jnp.asarray(
            flash_decode_long_batch(logA, logB, logPi, np.asarray(ys),
                                    num_segments=num_segments,
                                    group_steps=group_steps))

    return Decoder("flash_long", fn,
                   {"num_segments": num_segments,
                    "group_steps": group_steps, **static},
                   lambda K, T, **kw: _flash_memory(
                       K=K, T=T, num_segments=num_segments, mode="pointer"),
                   jittable=False, batch_fn=batch_fn)


def _walk_lane_split(deltas, logAT, state, valid, interpret,
                     max_lanes: int) -> "jnp.ndarray":
    """Walk N lanes as ceil(N/max_lanes) independent kernel calls (lanes
    are independent; the walk kernel's VMEM bound caps lanes per call)."""
    N = deltas.shape[1]
    if N <= max_lanes:
        return argmax_walk_pallas(deltas, logAT, state, valid=valid,
                                  interpret=interpret)
    outs = []
    for n0 in range(0, N, max_lanes):
        n1 = min(n0 + max_lanes, N)
        v = None if valid is None else valid[:, n0:n1]
        outs.append(argmax_walk_pallas(deltas[:, n0:n1], logAT,
                                       state[n0:n1], valid=v,
                                       interpret=interpret))
    return jnp.concatenate(outs, axis=0)


def _max_walk_lanes(K: int) -> int:
    n = 1
    while n < 128 and argmax_walk_supported(2 * n, K):
        n *= 2
    return n


def flash_decode_long_batched(logA, logB, logPi, ys, num_segments: int = 4,
                              group_steps: int = 4096,
                              interpret: bool | str = "auto") -> np.ndarray:
    """Batched host-phased FLASH decode: ONE logA stream serves the batch.

    ``flash_decode_long`` decodes sequences one at a time — at config-5
    scale each sequence's phase 1 re-streams logA for 65535 steps (~86 s of
    HBM time), so batch 8 pays that 8×.  Here:

    * **phase A** (forward, checkpointing): all B lanes advance together
      through grouped scans (logA read once per step for the whole batch);
      only the carry at each group boundary is kept (B*K floats per group
      — the √-checkpoint idea of ``checkpoint Viterbi.c`` at group
      granularity).  Deltas of the group are discarded (their write
      traffic is ~0.05% of the logA read traffic).
    * **phase B** (backward windowed walk): groups replay in reverse —
      re-scan group g from its checkpoint (recomputing the identical
      deltas) and walk it with the recompute kernel, chaining lane states.
      Total phase-1 work = 2 forward passes for the WHOLE batch instead
      of one per sequence.
    * **phase 2**: all B*N segments restart as one lane-batched grouped
      pipeline (identical per-lane semantics).

    Bit-identical to per-sequence ``flash_decode_long`` (pinned in
    tests/test_longform.py): recomputing a group's deltas from its
    checkpoint is the same deterministic computation, and lane batching
    changes nothing per lane.  Every dispatch stays bounded.
    """
    import os
    import time as _time

    verbose = bool(os.environ.get("FVT_LONGFORM_VERBOSE"))

    def _mark(tag, t0):
        if verbose:
            print(f"# longform {tag}: {_time.time() - t0:.1f}s", flush=True)
        return _time.time()

    _t = _time.time()
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    interpret = bool(interpret)
    ys = np.asarray(ys, np.int32)
    Bs, T = ys.shape
    K = logA.shape[0]
    logBT = jnp.transpose(logB)
    logAT = jnp.transpose(logA)
    N = int(num_segments)
    if N < 1 or T < 2 * N:
        N = max(1, min(N, T // 2)) or 1
    mids = flash_midpoints(0, T - 1, N) if N > 1 else []
    max_lanes = _max_walk_lanes(K)

    # ---- phase A: batched forward, group checkpoints ---------------------
    yd = jnp.asarray(ys)  # (Bs, T)
    d = _d0_phase1_batch(logA, logBT, logPi, yd[:, 0], interpret)
    bounds = []  # [(j0, n_steps)]
    ckpts = []   # carry at each group START (before its steps)
    j = 1
    while j < T:
        n = min(group_steps, T - j)
        ckpts.append(d)
        y_seg = jax.lax.dynamic_slice(yd, (0, j), (Bs, n))
        d, deltas = _scan_group(logA, logBT, y_seg, d, n_steps=n,
                                interpret=interpret, recompute=True)
        # host-SYNC each group: the async dispatch queue otherwise holds
        # every group's (n, Bs, K) delta buffer at once (16 x 2.15 GB at
        # config-5 = HBM OOM); a scalar readback bounds in-flight buffers
        float(np.asarray(d[0, 0]))
        del deltas  # discarded: phase B recomputes each group on demand
        bounds.append((j, n))
        j += n
    last = jnp.argmax(d, axis=1).astype(jnp.int32)  # (Bs,)
    _t = _mark("phaseA", _t)

    # ---- phase B: backward windowed recompute + walk ---------------------
    state = last
    pieces = []
    for (j0, n), ck in zip(reversed(bounds), reversed(ckpts)):
        y_seg = jax.lax.dynamic_slice(yd, (0, j0), (Bs, n))
        _, deltas = _scan_group(logA, logBT, y_seg, ck, n_steps=n,
                                interpret=interpret, recompute=True)
        w = _walk_lane_split(deltas, logAT, state, None, interpret,
                             max_lanes)  # (Bs, n + 1)
        pieces.append(np.asarray(w[:, 1:]))
        state = w[:, 0]
    pieces.append(np.asarray(state)[:, None])
    path1 = np.concatenate(pieces[::-1], axis=1)  # (Bs, T)
    _t = _mark("phaseB", _t)
    if not mids:
        return path1.astype(np.int64)
    anchors = path1[:, np.asarray(mids)]  # (Bs, N-1)
    last_np = np.asarray(last)
    del path1, pieces

    # ---- phase 2: lane-batched forced-boundary segment restarts ----------
    # Sequences run in sub-batches: holding every lane's delta parts at
    # once would need Lmax*Bs*N*K*4 bytes (34 GB at config-5); a sub-batch
    # bounds the held parts to ~6 GB.  Above ~8 lanes the scan is
    # VPU-bound, so sub-batching costs no throughput.
    starts, lens, Lmax = segment_layout(mids, T)
    starts_np = np.asarray(starts)
    lens_np = np.asarray(lens)
    idx = np.minimum(starts_np[:, None] + np.arange(Lmax)[None, :], T - 1)
    sub_seqs = max(1, int(6 * 1024**3 // (max(Lmax - 1, 1) * N * K * 4)))
    out = np.zeros((Bs, T), np.int64)
    for b0 in range(0, Bs, sub_seqs):
        b1 = min(b0 + sub_seqs, Bs)
        nb = b1 - b0
        NL = nb * N
        seg_sym = jnp.asarray(ys[b0:b1][:, idx].reshape(NL, Lmax))
        entries = jnp.asarray(np.concatenate(
            [np.zeros((nb, 1), np.int64), anchors[b0:b1]],
            axis=1).reshape(NL), jnp.int32)
        exits = jnp.asarray(np.concatenate(
            [anchors[b0:b1], last_np[b0:b1, None]],
            axis=1).reshape(NL), jnp.int32)
        first = jnp.asarray(np.tile(np.arange(N) == 0, nb))
        d = _d0_phase2(logA, logBT, logPi, entries, first, seg_sym[:, 0],
                       interpret)
        parts = []
        valids = []
        j = 1
        while j < Lmax:
            n = min(group_steps, Lmax - j)
            y_seg = jax.lax.dynamic_slice(seg_sym, (0, j), (NL, n))
            d, ptrs = _scan_group(logA, logBT, y_seg, d, n_steps=n,
                                  interpret=interpret, recompute=True)
            valid = jnp.asarray(np.tile(
                (j + np.arange(n))[:, None] <= (lens_np - 1)[None, :],
                (1, nb)))
            parts.append(ptrs)
            valids.append(valid)
            j += n
        state = exits
        pieces = []
        for pt, v in zip(reversed(parts), reversed(valids)):
            w = _walk_lane_split(pt, logAT, state, v, interpret, max_lanes)
            pieces.append(np.asarray(w[:, 1:]))
            state = w[:, 0]
        pieces.append(np.asarray(state)[:, None])
        del parts
        seg_paths = np.concatenate(pieces[::-1], axis=1)  # (NL, Lmax)
        for b in range(nb):
            for s in range(N):
                L0 = starts_np[s]
                out[b0 + b, L0:L0 + lens_np[s]] = \
                    seg_paths[b * N + s, :lens_np[s]]
    _mark("phase2", _t)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _d0_phase1_batch(logA, logBT, logPi, sym0, interpret: bool):
    return logPi[None, :] + logBT[sym0]
