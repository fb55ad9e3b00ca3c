"""Adaptive decoder selection — the "Adaptive" in FLASH made first-class.

The reference leaves adaptivity to the user: its README only advises that
"FLASH_BS [is] more memory-efficient for large state spaces; FLASH may be
faster for small state spaces; performance depends on T and cores"
(/root/reference/README.md:251-255), and every run hard-codes one
algorithm at compile time.  Here ``algorithm="auto"`` picks the fastest
exact decoder for the problem shape — calibrated against the measured
single-chip rows in ``results/SCALE.md`` — and an optional
``memory_budget_bytes`` filters candidates by their reference-style
analytic working set (each decoder's ``analytic_memory``), falling back
to the leanest mode when nothing fits.

Measured ranking being encoded (TPU v5e, SCALE.md):

* short/medium T: ``flash`` pointer N=8 (224 G upd/s) beats ``fused``
  (177 G) and ``checkpoint`` (223 G) at the headline K=3965 — except at
  VMEM-resident state counts (K <= 1024), where the resident-mode fused
  scan measured fastest (243 G at K=1024, T=4096);
* long T (>= ~8K steps): ``fused`` with the chunk-streamed backtrack
  kernel (301 G at K=1024/T=65536, round-3 hardware queue — the round-1
  "57 G" gap was the XLA walk's serial HBM gathers) while the (T, K)
  pointer table fits ``LONG_T_PTR_BUDGET``; ``checkpoint`` (146-223 G,
  no table at all) beyond that;
* tiny T: the D&C machinery has nothing to split; plain ``fused``;
* ``beam_width`` given: the beam family (``flash_bs``).

Selection happens at trace time (shapes are static under jit), so "auto"
is itself jittable and each distinct shape compiles its chosen decoder.
Selection sees the *padded* state count (the device arrays' true K) —
the same K its working-set estimates are honest for.
"""

from __future__ import annotations

from ..ops.pallas.maxplus import RESIDENT_MAX_K
from .base import Decoder, build, register
from .checkpoint import snapshot_step
from .flash import LEAF_LANES, LEAN_CHUNK, LEAN_LEAF

#: sequence length at which long-T handling kicks in.  Round-3 hardware
#: data (results/round3_measure.log::fused_longT_backtrack, K=1024,
#: T=65536): fused forward 184 ms + chunk-streamed kernel backtrack 44 ms
#: = 301 G upd/s, vs the XLA reverse walk's 125 ms (the round-1 "57 G
#: anomaly", now fixed) and checkpoint's 146-223 G.  So long T prefers
#: ``fused`` whenever its (T, K) int32 pointer table fits the HBM budget
#: below, and falls to ``checkpoint`` (no table at all) beyond it.
LONG_T = 8192
#: pointer-table budget for the long-T fused route: 268 MB at
#: K=1024/T=65536 is fine; config-5's 4 GB per sequence is not (the
#: batch multiplies it) — checkpoint/lean take over there.
LONG_T_PTR_BUDGET = 1 * 1024 * 1024 * 1024
#: below this there is nothing worth segmenting
TINY_T = 32


#: estimated single-dispatch seconds above which one full-trellis sweep
#: must be host-phased (``flash_long``): some environments bound a single
#: device dispatch (the axon tunnel kills ~2 min dispatches — measured,
#: results/ROUND3.md); 60 s of headroom at the measured ~190 G upd/s
#: dense-kernel rate.  The bound is ENVIRONMENT-SPECIFIC, so the default
#: is off (0 = unbounded) on a normal TPU deployment and 60 s only when
#: the axon tunnel is detected; override via FVT_DISPATCH_CEILING_S.
def _default_ceiling() -> str:
    import os

    # the tunnel exports these markers (JAX_PLATFORMS=axon + remote compile)
    axon = (os.environ.get("JAX_PLATFORMS", "") == "axon"
            or os.environ.get("PALLAS_AXON_REMOTE_COMPILE"))
    return "60" if axon else "0"


DISPATCH_CEILING_S = float(
    __import__("os").environ.get("FVT_DISPATCH_CEILING_S",
                                 _default_ceiling()))
_DENSE_CELLS_PER_S = 1.9e11  # measured kernel rate, K=1024..16384 (SCALE.md)


def _sweep_seconds(K: int, T: int) -> float:
    return float(T) * K * K / _DENSE_CELLS_PER_S


def rank(K: int, T: int, beam_width: int | None = None) -> list[tuple[str, dict]]:
    """Candidate (algorithm, static-kwargs) in measured-speed order."""
    if beam_width is not None:
        # one candidate: the beamed D&C engine.  The dense `beam` decoder
        # is NOT a fallback — its (T, B) tables are as large as flash_bs's
        # and it measured slower; there is nothing leaner to fall to.
        return [("flash_bs", {"beam_width": beam_width, "num_segments": 8})]
    if DISPATCH_CEILING_S and _sweep_seconds(K, T) > DISPATCH_CEILING_S:
        # config-5-class shapes: one forward sweep alone exceeds the
        # dispatch ceiling — only the host-phased decoder can run.
        # num_segments=1 (pure 2-pass: checkpointed forward + backward
        # recompute walk, no phase-2 restarts) measured fastest at the
        # 256xK16384xT65536 spec scale on one chip (32.7 s/seq vs ~50 at
        # N=4 — phase 2 is a third full pass; segment restarts exist for
        # PARALLEL distribution, which one chip doesn't need)
        return [("flash_long", {"num_segments": 1})]
    if T < TINY_T:
        return [("fused", {}), ("checkpoint", {})]
    if T >= LONG_T:
        if T * K * 4 <= LONG_T_PTR_BUDGET:
            return [("fused", {}), ("checkpoint", {}),
                    ("flash", {"mode": "lean"})]
        return [("checkpoint", {}), ("flash", {"mode": "lean"})]
    if K <= RESIDENT_MAX_K:
        return [("fused", {}), ("flash", {"num_segments": 16}),
                ("checkpoint", {}), ("flash", {"mode": "lean"})]
    # num_segments=16 measured fastest across the mid/large-K shapes in
    # round 5 (results/round5_measure.log sweep: headline 13.0 -> 10.2 ms,
    # K=2048/T=512 6.11 -> 5.86, K=8192 102 -> 98; 32+ regresses — the
    # phase-1 plane work grows with N while phase-2's shared logA stream
    # stops being the bottleneck)
    return [("flash", {"num_segments": 16}), ("checkpoint", {}),
            ("fused", {}), ("flash", {"mode": "lean"})]


def device_working_set(name: str, kw: dict, K: int, T: int) -> int:
    """Implementation-honest peak HBM working set of a decoder's scratch
    (excluding the model tables themselves, which every decoder holds).

    This deliberately differs from ``analytic_memory`` — that figure is
    *reference-exact* (it reproduces the C binaries' ``memory:`` output,
    which accounts the lean algorithm), while the TPU pointer/fused modes
    trade extra HBM for speed.  The budget filter must see that trade.
    """
    N = kw.get("num_segments", 8)
    B = kw.get("beam_width", 64)
    if name == "flash_long" or (name == "flash" and kw.get("mode") != "lean"):
        # per-round batched phase-2 pointer tables cover the sequence once
        # (flash_long accumulates the same tables as device-resident group
        # parts before each walk — same peak)
        return T * K * 4 + 4 * K * 4
    if name == "flash":
        # hybrid lean (flash.flash_decode mode="lean"): peak is the larger
        # of (a) a lean round's streamed pointer chunk over all S live
        # intervals plus their (delta, t2) carries, S bounded by the last
        # pre-leaf round (intervals of length ~2*LEAN_LEAF), and (b) the
        # leaf pass's (LEAN_LEAF-1, LEAF_LANES, K) pointer table — plus the
        # O(N*K) anchor planes.  Mirrors _lean_round_pallas/_decode_leaves.
        leaf = int(kw.get("lean_leaf", LEAN_LEAF))
        if leaf <= 0:  # pure lean: no leaf pass, rounds split to length 2
            s_max = max(N, (T + 3) // 4)
            return (2 * LEAN_CHUNK + 2) * s_max * K * 4 + (2 * N + 4) * K * 4
        seg_len = -(-T // max(N, 1))
        if seg_len <= leaf:  # segments go straight to leaves, no rounds
            round_b = 0
            llen, n_leaves = seg_len, N
        else:
            s_max = max(N, T // max(2 * leaf, 1))
            # x2: the gathered emissions chunk is live alongside the pointers
            round_b = (2 * LEAN_CHUNK + 2) * s_max * K * 4
            llen, n_leaves = leaf, max(1, -(-T // max(leaf, 2)))
        leaf_b = 2 * max(llen - 1, 1) * min(LEAF_LANES, n_leaves) * K * 4
        return max(round_b, leaf_b) + (2 * N + 4) * K * 4
    if name == "checkpoint":
        # honor a caller step override; default is what the decode runs
        step = int(kw.get("step", 0) or 0)
        if step <= 0:
            step = snapshot_step(T)
        return (T // step + 1) * K * 4 + step * K * 4
    if name == "fused":
        return build("fused").analytic_memory(K=K, T=T)  # honest for fused
    if name == "vanilla":
        return 2 * T * K * 4              # full T1 + T2 tables
    if name in ("flash_bs", "beam"):
        return T * B * 8 + 4 * B * 8
    return T * K * 4


def choose(K: int, T: int, memory_budget_bytes: int | None = None,
           beam_width: int | None = None,
           static: dict | None = None) -> tuple[str, dict]:
    """The (algorithm, kwargs) ``auto`` will run for this shape.

    ``static`` carries caller overrides (num_segments, mode, ...): they
    are merged into every candidate BEFORE the working-set filter, so the
    budget is checked against the configuration that would actually run.
    """
    over = static or {}
    cands = [(name, {**kw, **over}) for name, kw in rank(K, T, beam_width)]
    if memory_budget_bytes is None:
        return cands[0]
    for name, kw in cands:
        if device_working_set(name, kw, K, T) <= memory_budget_bytes:
            return name, kw
    # nothing fits: take the leanest candidate rather than crash —
    # min() is stable, so ties keep the faster (earlier) entry
    return min(cands, key=lambda c: device_working_set(c[0], c[1], K, T))


@register("auto")
def _build(memory_budget_bytes: int | None = None,
           beam_width: int | None = None, **static) -> Decoder:
    cache: dict = {}

    def fn(logA, logB, logPi, y):
        K, T = int(logA.shape[0]), int(y.shape[-1])
        name, kw = choose(K, T, memory_budget_bytes, beam_width, static)
        key = (name, tuple(sorted(kw.items())))
        if key not in cache:
            cache[key] = build(name, **kw)
        return cache[key](logA, logB, logPi, y)

    def memory(K: int, T: int, K_padded: int | None = None, **_) -> int:
        # selection happens at the padded K (the device arrays' trace
        # shape) — re-derive the choice there when the caller supplies it
        # (decode() does), then report the figure at the logical K
        name, kw = choose(K if K_padded is None else int(K_padded), T,
                          memory_budget_bytes, beam_width, static)
        return build(name, **kw).analytic_memory(K=K, T=T)

    def jittable_fn(K: int, T: int) -> bool:
        # host-driven choices (flash_long at dispatch-ceiling scale) must
        # not be wrapped in jax.jit; decode() asks per shape
        name, kw = choose(K, T, memory_budget_bytes, beam_width, static)
        key = (name, tuple(sorted(kw.items())))
        if key not in cache:
            cache[key] = build(name, **kw)
        return cache[key].jittable

    return Decoder("auto", fn,
                   {"memory_budget_bytes": memory_budget_bytes,
                    "beam_width": beam_width, **static}, memory,
                   jittable_fn=jittable_fn)
