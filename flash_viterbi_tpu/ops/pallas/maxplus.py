"""Fused Pallas TPU kernel for the max-plus trellis scan.

One `pallas_call` runs the ENTIRE forward recursion

    delta_t[n, i] = max_k( delta_{t-1}[n, k] + logA[k, i] ) + emit_t[n, i]
    ptr_t[n, i]   = argmax_k(...)          (lowest k on ties)

for all T' steps and N independent lanes (N=1: one sequence; N>1: the
batched per-segment decode of FLASH phase 2).  The XLA version
(``ops.maxplus.forward_scan``) materializes the (K, K) score tensor in HBM
every step — ~3x the speed-of-light HBM traffic; this kernel streams
``logA`` tiles through VMEM once per step (the only irreducible traffic)
and keeps the carry, accumulators and pointer row on chip — the VMEM
double-buffering of the reference's FPGA PROB_CACHE/STATE_CACHE ping-pong
(SURVEY.md §2.5) and the TPU replacement for the reference's K² inner loop
(``src/FLASH_Viterbi_multithread.c:159-183``).

Grid: ``(T', K // BK)``; TPU grids iterate sequentially, so VMEM scratch
carries ``delta`` across steps.  Source tiles are visited in ascending
order and combined with a strictly-greater compare, so the argmax witness
is the global lowest index — bit-identical to ``jnp.argmax`` and the
framework numerics contract (``ops.maxplus``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = np.float32(-np.inf)  # numpy scalar: no backend init at import

# VMEM budget for the (double-buffered) logA tile: leave headroom for the
# carry/accumulator scratch and the emission/pointer blocks.
_VMEM_BUDGET = 12 * 1024 * 1024


def kernel_supported(K: int) -> bool:
    """True iff :func:`_pick_tiles` can tile this state count — the real
    constraint every decoder's use_pallas guard must match: K <= 128 needs
    only sublane alignment (K % 8); above that the source tile is a lane
    slice of the carry, so K must be a multiple of 128."""
    if K % 8:
        return False
    if K > 128 and K % 128:
        return False
    try:
        _pick_tiles(K)
    except ValueError:
        return False
    return True


# double-buffered logA tile budget for the big-K tile search (round 5):
# v5e has 128 MB physical VMEM; 17 MB admits the measured-fastest
# (1024, 2048) tile at K >= 8192 (hw sweep in scripts/vpu_probe.py /
# results/vpu_probe.json: 1.78 ms/step vs the round-4 (128, 8192)
# fallback's 3.54 ms at K=16384, N=16 — config-5's phase A)
_BIG_TILE_BUDGET = 17 * 1024 * 1024


def _pick_tiles(K: int) -> tuple[int, int]:
    """(BK, BI): source-tile rows and dest-tile lanes.

    BK must stay >= 128 (lane slices of the carry must be 128-aligned).
    For K < 8192 a full-width (BK, K) tile fits the 12 MB budget and the
    measured optimum keeps it (BK=256, BI=K at K=4096 beat every
    alternative on hw).  At K >= 8192 full width would force BK=128,
    which runs at barely half the VPU rate of a square-ish tile — there
    the search maximizes tile area, preferring tall tiles (the hw sweep
    ranks (1024, 2048) > (512, 2048) > (512, 4096) > (256, 4096) >>
    (128, 8192)).  Tiling is numerics-free: max is associative and tiles
    are visited in ascending source order, so the strict-greater combine
    keeps the lowest-index argmax contract at any (BK, BI).
    """
    if K % 8 or (K % 128 and K > 128):
        raise ValueError(f"K={K} must be a multiple of 8 (pad the model first)")
    if K >= 8192:
        best = None
        for bk in (1024, 512, 256, 128):
            if K % bk:
                continue
            bi = K
            while bi > 128 and 2 * bk * bi * 4 > _BIG_TILE_BUDGET:
                bi //= 2
            if bi < 128 or K % bi or 2 * bk * bi * 4 > _BIG_TILE_BUDGET:
                continue
            cand = (bk * bi, bk, bi)  # area first, then taller
            if best is None or cand > best:
                best = cand
        if best is None:
            raise ValueError(f"cannot tile K={K} into VMEM")
        return best[1], best[2]
    for bk in (512, 256, 128):
        if K % bk == 0 and 2 * bk * K * 4 <= _VMEM_BUDGET:
            return bk, K
    if K < 128:  # tiny models: whole matrix fits trivially
        return K, K
    BK = 128
    BI = K
    while 2 * BK * BI * 4 > _VMEM_BUDGET:
        BI //= 2
    if BI < 128 or K % BI:
        raise ValueError(f"cannot tile K={K} into VMEM")
    return BK, BI


def _scan_kernel(delta0_ref, logA_ref, emits_ref, dfin_ref, ptr_ref,
                 dbuf_ref, accv_ref, acca_ref, *, N: int, BK: int, BI: int):
    """Grid (T', IT, KT): dest tiles middle, source tiles innermost.

    The carry is ping-ponged between ``dbuf[t%2]`` (read) and
    ``dbuf[(t+1)%2]`` (write) so dest tiles written at step t never corrupt
    the reads of later dest tiles in the same step.
    """
    t = pl.program_id(0)
    it = pl.program_id(1)
    kt = pl.program_id(2)
    KT = pl.num_programs(2)
    cur = t % 2
    nxt = (t + 1) % 2

    @pl.when((t == 0) & (it == 0) & (kt == 0))
    def _():
        dbuf_ref[0, :, :] = delta0_ref[:]

    tile = logA_ref[:]  # (BK, BI)
    # carry lives in row layout (N, K) — a (K, N) column scratch would be
    # lane-padded to (K, 128) and blow VMEM at large K; the per-tile
    # (N, BK) -> (BK, N) transpose is a handful of vreg shuffles
    d_col = jnp.transpose(dbuf_ref[cur, :, pl.ds(kt * BK, BK)])  # (BK, N)

    K = dbuf_ref.shape[2]
    # source-index plane for lowest-index tie-breaking (Mosaic's argmax does
    # not guarantee first-occurrence on exact fp32 ties)
    src_idx = jax.lax.broadcasted_iota(jnp.int32, (BK, BI), 0) + kt * BK

    for n in range(N):  # static unroll; N is 1 (scan) or the segment count
        tmp = d_col[:, n:n + 1] + tile  # (BK, BI)
        val = jnp.max(tmp, axis=0, keepdims=True)  # (1, BI)
        loc = jnp.min(jnp.where(tmp == val, src_idx, K + kt * BK),
                      axis=0, keepdims=True)

        @pl.when(kt == 0)
        def _():
            accv_ref[n:n + 1, :] = val
            acca_ref[n:n + 1, :] = loc

        @pl.when(kt > 0)
        def _():
            prev = accv_ref[n:n + 1, :]
            better = val > prev  # strict: earlier (lower-k) tile wins ties
            acca_ref[n:n + 1, :] = jnp.where(better, loc, acca_ref[n:n + 1, :])
            accv_ref[n:n + 1, :] = jnp.where(better, val, prev)

    @pl.when(kt == KT - 1)
    def _():
        newd = accv_ref[:] + emits_ref[0, :, :]  # (N, BI)
        ptr_ref[0, :, :] = acca_ref[:]
        dfin_ref[:] = newd
        dbuf_ref[nxt, :, pl.ds(it * BI, BI)] = newd  # carry for step t+1


def _scan_deltas_kernel(delta0_ref, logA_ref, emits_ref, dfin_ref, dout_ref,
                        dbuf_ref, accv_ref, *, N: int, BK: int, BI: int):
    """Pointer-free forward scan: emits the carry HISTORY instead of argmax
    witnesses.  ``dout[t] = delta_t`` (the carry BEFORE step t); the
    backtrack recomputes each walked step's argmax from ``delta_t`` plus
    ONE logA column (``argmax_walk_pallas``) — the SURVEY §7
    "recompute-argmax-on-backtrack" trade.  Dropping the in-scan
    compare/select/min chain cuts the per-cell VPU work from ~5 ops to ~2,
    which is the whole bottleneck of the N-lane batched scan (HBM has 15x
    slack there).  Same grid/tiling/carry ping-pong as ``_scan_kernel``.
    """
    t = pl.program_id(0)
    it = pl.program_id(1)
    kt = pl.program_id(2)
    KT = pl.num_programs(2)
    cur = t % 2
    nxt = (t + 1) % 2

    @pl.when((t == 0) & (it == 0) & (kt == 0))
    def _():
        dbuf_ref[0, :, :] = delta0_ref[:]

    @pl.when(kt == 0)
    def _():
        # the carry slice for this dest tile, BEFORE this step's update
        dout_ref[0, :, :] = dbuf_ref[cur, :, pl.ds(it * BI, BI)]

    tile = logA_ref[:]  # (BK, BI)
    d_col = jnp.transpose(dbuf_ref[cur, :, pl.ds(kt * BK, BK)])  # (BK, N)

    for n in range(N):
        val = jnp.max(d_col[:, n:n + 1] + tile, axis=0, keepdims=True)

        @pl.when(kt == 0)
        def _():
            accv_ref[n:n + 1, :] = val

        @pl.when(kt > 0)
        def _():
            accv_ref[n:n + 1, :] = jnp.maximum(accv_ref[n:n + 1, :], val)

    @pl.when(kt == KT - 1)
    def _():
        newd = accv_ref[:] + emits_ref[0, :, :]  # (N, BI)
        dfin_ref[:] = newd
        dbuf_ref[nxt, :, pl.ds(it * BI, BI)] = newd  # carry for step t+1


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxplus_scan_deltas(logA: jax.Array, emits: jax.Array, delta0: jax.Array,
                        interpret: bool = False):
    """Forward scan emitting the carry history instead of pointer rows.

    Returns (delta_final (N, K), deltas (T', N, K) f32) with
    ``deltas[t] = delta_t`` (carry before step t; ``deltas[0] == delta0``).
    Pair with :func:`argmax_walk_pallas` for the backtrack.  Bit-identical
    scores to :func:`maxplus_scan` (same adds, same maxes — only the
    argmax bookkeeping is dropped).
    """
    Tm, N, K = emits.shape
    assert logA.shape == (K, K) and delta0.shape == (N, K)
    if Tm == 0:
        return delta0, jnp.zeros((0, N, K), jnp.float32)
    if (K <= RESIDENT_MAX_K and logA.dtype == jnp.float32
            and (K * K + 2 * _RESIDENT_CHUNK * N * K) * 4 <= _VMEM_BUDGET):
        return _maxplus_scan_resident_deltas(logA, emits, delta0, interpret)
    BK, BI = _pick_tiles(K)
    KT = K // BK
    IT = K // BI

    kernel = functools.partial(_scan_deltas_kernel, N=N, BK=BK, BI=BI)
    dfin, deltas = pl.pallas_call(
        kernel,
        grid=(Tm, IT, KT),
        in_specs=[
            pl.BlockSpec((N, K), lambda t, it, kt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BI), lambda t, it, kt: (kt, it), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, BI), lambda t, it, kt: (t, 0, it), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, BI), lambda t, it, kt: (0, it), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, BI), lambda t, it, kt: (t, 0, it), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((Tm, N, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, N, K), jnp.float32),  # ping-pong delta carry
            pltpu.VMEM((N, BI), jnp.float32),    # running max
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tm * N * K * K,
            bytes_accessed=Tm * K * K * 4 + Tm * N * K * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                4 * (2 * BK * BI + 2 * max(N, 8) * K + 6 * max(N, 8) * BI)
                + 12 * 1024 * 1024)),
        interpret=interpret,
    )(delta0, logA, emits)
    return dfin, deltas


# Below this state count the whole logA matrix stays VMEM-resident and the
# time loop runs inside the kernel — zero HBM re-streaming per step, which
# is what makes small-K long-T decoding VPU-bound instead of launch-bound.
# (public name — ranking heuristics in algorithms/auto.py key off it)
RESIDENT_MAX_K = 1024
_RESIDENT_CHUNK = 128


def _scan_res_kernel(delta0_ref, logA_ref, emits_ref, dfin_ref, ptr_ref,
                     drow_ref, *, N: int, C: int, Tm: int):
    """Resident mode: grid over time chunks only; logA never leaves VMEM."""
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _():
        drow_ref[:] = delta0_ref[:]

    A = logA_ref[:]  # (K, K), VMEM-resident
    K = A.shape[0]
    src_idx = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)

    def body(c, _):
        valid = tc * C + c < Tm
        d = drow_ref[:]  # (N, K)
        for n in range(N):
            col = jnp.transpose(d[n:n + 1, :])  # (K, 1)
            tmp = col + A  # (K, K)
            val = jnp.max(tmp, axis=0, keepdims=True)
            loc = jnp.min(jnp.where(tmp == val, src_idx, K),
                          axis=0, keepdims=True)
            emit = emits_ref[c, n:n + 1, :]
            newd = val + emit
            iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            ptr_ref[c, n:n + 1, :] = jnp.where(valid, loc, iota_row)
            drow_ref[n:n + 1, :] = jnp.where(valid, newd, d[n:n + 1, :])
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    @pl.when(tc == pl.num_programs(0) - 1)
    def _():
        dfin_ref[:] = drow_ref[:]


def _scan_res_deltas_kernel(delta0_ref, logA_ref, emits_ref, dfin_ref,
                            dout_ref, drow_ref, *, N: int, C: int, Tm: int):
    """Resident-mode pointer-free scan: emits the carry history (see
    ``_scan_deltas_kernel``); logA never leaves VMEM.  Resident shapes are
    entirely VPU-bound, so dropping the argmax bookkeeping (~60% of the
    per-cell ops) is the same ~2x win as in the tiled kernel."""
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _():
        drow_ref[:] = delta0_ref[:]

    A = logA_ref[:]  # (K, K), VMEM-resident

    def body(c, _):
        valid = tc * C + c < Tm
        d = drow_ref[:]  # (N, K)
        dout_ref[pl.ds(c, 1), :, :] = d[None]  # carry BEFORE this step
        for n in range(N):
            col = jnp.transpose(d[n:n + 1, :])  # (K, 1)
            val = jnp.max(col + A, axis=0, keepdims=True)
            newd = val + emits_ref[c, n:n + 1, :]
            drow_ref[n:n + 1, :] = jnp.where(valid, newd, d[n:n + 1, :])
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    @pl.when(tc == pl.num_programs(0) - 1)
    def _():
        dfin_ref[:] = drow_ref[:]


def _maxplus_scan_resident_deltas(logA, emits, delta0, interpret: bool):
    Tm, N, K = emits.shape
    C = min(_RESIDENT_CHUNK, Tm)
    TC = -(-Tm // C)
    Tp = TC * C
    if Tp != Tm:
        pad = jnp.zeros((Tp - Tm, N, K), emits.dtype)
        emits = jnp.concatenate([emits, pad])

    kernel = functools.partial(_scan_res_deltas_kernel, N=N, C=C, Tm=Tm)
    dfin, deltas = pl.pallas_call(
        kernel,
        grid=(TC,),
        in_specs=[
            pl.BlockSpec((N, K), lambda tc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda tc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N, K), lambda tc: (tc, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, K), lambda tc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N, K), lambda tc: (tc, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((Tp, N, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, K), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tm * N * K * K,
            bytes_accessed=K * K * 4 + Tm * N * K * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                4 * (K * K + 8 * C * max(N, 8) * K) + 8 * 1024 * 1024)),
        interpret=interpret,
    )(delta0, logA, emits)
    return dfin, deltas[:Tm]


def _maxplus_scan_resident(logA, emits, delta0, interpret: bool):
    Tm, N, K = emits.shape
    C = min(_RESIDENT_CHUNK, Tm)
    TC = -(-Tm // C)
    Tp = TC * C
    if Tp != Tm:
        pad = jnp.zeros((Tp - Tm, N, K), emits.dtype)
        emits = jnp.concatenate([emits, pad])

    kernel = functools.partial(_scan_res_kernel, N=N, C=C, Tm=Tm)
    dfin, ptrs = pl.pallas_call(
        kernel,
        grid=(TC,),
        in_specs=[
            pl.BlockSpec((N, K), lambda tc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda tc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N, K), lambda tc: (tc, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, K), lambda tc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N, K), lambda tc: (tc, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((Tp, N, K), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, K), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tm * N * K * K,
            bytes_accessed=K * K * 4 + Tm * N * K * 8,
            transcendentals=0,
        ),
        # default ~16 MB scoped-VMEM limit is too tight for the resident
        # logA + double-buffered (C, N, K) emit/ptr blocks with sublane
        # padding; size it from the real buffers (v5e: 128 MiB physical)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                4 * (K * K + 6 * C * max(N, 8) * K) + 8 * 1024 * 1024)),
        interpret=interpret,
    )(delta0, logA, emits)
    return dfin, ptrs[:Tm]


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxplus_scan(logA: jax.Array, emits: jax.Array, delta0: jax.Array,
                 interpret: bool = False):
    """Run the fused forward scan.

    Args:
      logA:   (K, K) fp32, source k rows -> dest i cols.
      emits:  (T', N, K) fp32 log emission rows for steps 1..T'.
      delta0: (N, K) fp32 scores at step 0.
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      (delta_final (N, K) fp32, ptrs (T', N, K) int32).
    """
    Tm, N, K = emits.shape
    assert logA.shape == (K, K) and delta0.shape == (N, K)
    if Tm == 0:  # T=1 sequences: nothing to scan
        return delta0, jnp.zeros((0, N, K), jnp.int32)
    if (K <= RESIDENT_MAX_K and logA.dtype == jnp.float32
            and (K * K + 2 * _RESIDENT_CHUNK * N * K) * 4 <= _VMEM_BUDGET):
        return _maxplus_scan_resident(logA, emits, delta0, interpret)
    BK, BI = _pick_tiles(K)
    KT = K // BK
    IT = K // BI

    grid = (Tm, IT, KT)
    kernel = functools.partial(_scan_kernel, N=N, BK=BK, BI=BI)
    dfin, ptrs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, K), lambda t, it, kt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BI), lambda t, it, kt: (kt, it), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, BI), lambda t, it, kt: (t, 0, it), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, BI), lambda t, it, kt: (0, it), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, BI), lambda t, it, kt: (t, 0, it), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((Tm, N, K), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, N, K), jnp.float32),  # ping-pong delta carry
            pltpu.VMEM((N, BI), jnp.float32),    # running max
            pltpu.VMEM((N, BI), jnp.int32),      # running argmax
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tm * N * K * K,
            bytes_accessed=Tm * K * K * 4 + Tm * N * K * 8,
            transcendentals=0,
        ),
        # the default scoped-VMEM limit is ~16 MB; at K=16384 the
        # double-buffered tall tile + the lane-padded carry blocks
        # legitimately need more (v5e has 128 MiB physical VMEM) — size the
        # limit from the actual buffers instead of failing at compile.
        # This pointer variant carries the int32 acca scratch + ptr output
        # blocks on top of the deltas variant (+5 MB at the round-5
        # (1024, 2048) tiles, measured via compile-time OOM on hw)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                4 * (2 * BK * BI + 2 * max(N, 8) * K + 8 * max(N, 8) * BI)
                + 18 * 1024 * 1024)),
        interpret=interpret,
    )(delta0, logA, emits)
    return dfin, ptrs


def forward_scan_pallas(delta0: jax.Array, logA: jax.Array, emits: jax.Array,
                        interpret: bool = False):
    """Drop-in for ``ops.maxplus.forward_scan`` (N=1).

    Args: delta0 (K,), logA (K, K), emits (T', K).
    Returns: (delta_final (K,), ptrs (T', K) int32).
    """
    Tm, K = emits.shape
    dfin, ptrs = maxplus_scan(logA, emits[:, None, :], delta0[None, :],
                              interpret=interpret)
    return dfin[0], ptrs[:, 0, :]


# ---------------------------------------------------------------------------
# Variant with in-kernel emission gather: no (T', N, K) emissions buffer.
# The (M, K) transposed emission table stays VMEM-resident and each step
# reads its row by the observation symbol (SMEM block) — removes the HBM
# emissions materialization entirely, which is what makes T=65536-scale
# single-chip decoding possible (the emissions buffer alone would be T*K*4
# bytes).  Requires M * K * 4 <= ~2 MB.
# ---------------------------------------------------------------------------

def _scan_eg_kernel(ys_ref, delta0_ref, logA_ref, logBT_ref, dfin_ref,
                    ptr_ref, drow_ref, accv_ref, acca_ref, *, N: int, BK: int):
    t = pl.program_id(0)
    kt = pl.program_id(1)
    KT = pl.num_programs(1)

    @pl.when((t == 0) & (kt == 0))
    def _():
        drow_ref[:] = delta0_ref[:]

    tile = logA_ref[:]  # (BK, K)
    d_col = jnp.transpose(drow_ref[:, pl.ds(kt * BK, BK)])  # (BK, N)
    K = tile.shape[1]
    src_idx = jax.lax.broadcasted_iota(jnp.int32, (BK, K), 0) + kt * BK

    for n in range(N):
        tmp = d_col[:, n:n + 1] + tile
        val = jnp.max(tmp, axis=0, keepdims=True)
        loc = jnp.min(jnp.where(tmp == val, src_idx, K + kt * BK),
                      axis=0, keepdims=True)

        @pl.when(kt == 0)
        def _():
            accv_ref[n:n + 1, :] = val
            acca_ref[n:n + 1, :] = loc

        @pl.when(kt > 0)
        def _():
            prev = accv_ref[n:n + 1, :]
            better = val > prev
            acca_ref[n:n + 1, :] = jnp.where(better, loc, acca_ref[n:n + 1, :])
            accv_ref[n:n + 1, :] = jnp.where(better, val, prev)

    @pl.when(kt == KT - 1)
    def _():
        rows = [logBT_ref[ys_ref[t, n], :][None, :] for n in range(N)]
        emit = jnp.concatenate(rows, axis=0) if N > 1 else rows[0]
        newd = accv_ref[:] + emit  # (N, K)
        ptr_ref[0, :, :] = acca_ref[:]
        dfin_ref[:] = newd
        drow_ref[:] = newd


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxplus_scan_emitgather(logA: jax.Array, logBT: jax.Array, ys: jax.Array,
                            delta0: jax.Array, interpret: bool = False):
    """Fused forward scan with in-kernel emission rows.

    Args:
      logA:   (K, K) fp32.
      logBT:  (M, K) fp32 — ``logB.T``, kept VMEM-resident.
      ys:     (T', N) int32 observation symbols for steps 1..T'.
      delta0: (N, K) fp32.

    Returns: (delta_final (N, K), ptrs (T', N, K) int32).
    """
    Tm, N = ys.shape
    K = logA.shape[0]
    M = logBT.shape[0]
    assert logBT.shape == (M, K) and delta0.shape == (N, K)
    BK, BI = _pick_tiles(K)
    assert BI == K, "emit-gather kernel requires untiled dest dim"
    KT = K // BK

    kernel = functools.partial(_scan_eg_kernel, N=N, BK=BK)
    dfin, ptrs = pl.pallas_call(
        kernel,
        grid=(Tm, KT),
        in_specs=[
            # whole symbol array in SMEM (tiny; long-T callers chunk)
            pl.BlockSpec((Tm, N), lambda t, kt: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((N, K), lambda t, kt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, K), lambda t, kt: (kt, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda t, kt: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, K), lambda t, kt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, K), lambda t, kt: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((Tm, N, K), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, K), jnp.float32),
            pltpu.VMEM((N, K), jnp.float32),
            pltpu.VMEM((N, K), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tm * N * K * K,
            bytes_accessed=Tm * K * K * 4 + Tm * N * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ys, delta0, logA, logBT)
    return dfin, ptrs


# ---------------------------------------------------------------------------
# Rectangular single-step kernel: one max-plus matvec against a COLUMN SHARD
# of logA (the state-sharded trellis step of parallel.sharded).  delta is the
# full-K carry (replicated over the 'state' mesh axis); the block computes
# the local K_d-slice of the destination scores + global-index argmax
# witnesses; the caller adds the emission slice and all_gathers.  Tie-break:
# source tiles ascend and combine with strict '>', so the witness is the
# globally lowest source index — same contract as the fused scan kernel.
# ---------------------------------------------------------------------------

def _step_tiles_kernel(delta_ref, logA_ref, val_ref, ptr_ref,
                       accv_ref, acca_ref, *, N: int, BK: int, BI: int,
                       Ks: int):
    kt = pl.program_id(1)
    KT = pl.num_programs(1)
    tile = logA_ref[:]  # (BK, BI)
    d_col = jnp.transpose(delta_ref[:, pl.ds(kt * BK, BK)])  # (BK, N)
    src_idx = jax.lax.broadcasted_iota(jnp.int32, (BK, BI), 0) + kt * BK

    for n in range(N):
        tmp = d_col[:, n:n + 1] + tile
        val = jnp.max(tmp, axis=0, keepdims=True)
        loc = jnp.min(jnp.where(tmp == val, src_idx, Ks + kt * BK),
                      axis=0, keepdims=True)

        @pl.when(kt == 0)
        def _():
            accv_ref[n:n + 1, :] = val
            acca_ref[n:n + 1, :] = loc

        @pl.when(kt > 0)
        def _():
            prev = accv_ref[n:n + 1, :]
            better = val > prev  # strict: earlier (lower-k) tile wins ties
            acca_ref[n:n + 1, :] = jnp.where(better, loc, acca_ref[n:n + 1, :])
            accv_ref[n:n + 1, :] = jnp.where(better, val, prev)

    @pl.when(kt == KT - 1)
    def _():
        val_ref[:] = accv_ref[:]
        ptr_ref[:] = acca_ref[:]


def _pick_tiles_rect(Ks: int, Kd: int) -> tuple[int, int]:
    """(BK, BI) for a (Ks, Kd) block: BK over source rows (128-aligned lane
    slices of the carry), BI over dest lanes."""
    for d in (Ks, Kd):
        if d % 8 or (d % 128 and d > 128):
            raise ValueError(f"dim {d} not tileable (pad the model first)")
    for bk in (512, 256, 128):
        if Ks % bk == 0 and 2 * bk * Kd * 4 <= _VMEM_BUDGET:
            return bk, Kd
    if Ks <= 128:
        return Ks, Kd
    BK, BI = 128, Kd
    while 2 * BK * BI * 4 > _VMEM_BUDGET:
        BI //= 2
    if BI < 128 or Kd % BI:
        raise ValueError(f"cannot tile ({Ks},{Kd}) into VMEM")
    return BK, BI


def step_block_supported(Ks: int, Kd: int) -> bool:
    try:
        _pick_tiles_rect(Ks, Kd)
    except ValueError:
        return False
    return True


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxplus_step_block(delta: jax.Array, logA_block: jax.Array,
                       interpret: bool = False):
    """One trellis step against a column shard of logA.

    Args:
      delta:      (N, Ks) fp32 full-source carry.
      logA_block: (Ks, Kd) fp32 — a column slice logA[:, lo:lo+Kd].

    Returns:
      (val (N, Kd) fp32 pre-emission scores,
       ptr (N, Kd) int32 global source indices).
    """
    N, Ks = delta.shape
    Kd = logA_block.shape[1]
    assert logA_block.shape[0] == Ks
    BK, BI = _pick_tiles_rect(Ks, Kd)
    KT = Ks // BK
    IT = Kd // BI
    kernel = functools.partial(_step_tiles_kernel, N=N, BK=BK, BI=BI, Ks=Ks)
    val, ptr = pl.pallas_call(
        kernel,
        grid=(IT, KT),
        in_specs=[
            pl.BlockSpec((N, Ks), lambda it, kt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BI), lambda it, kt: (kt, it), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, BI), lambda it, kt: (0, it), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BI), lambda it, kt: (0, it), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Kd), jnp.float32),
            jax.ShapeDtypeStruct((N, Kd), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, BI), jnp.float32),
            pltpu.VMEM((N, BI), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * Ks * Kd,
            bytes_accessed=Ks * Kd * 4 + N * (Ks + 2 * Kd) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(delta, logA_block)
    return val, ptr


def emitgather_supported(K: int, M: int) -> bool:
    """VMEM residency bound for the transposed emission table (and the
    untiled-dest constraint of the eg kernel)."""
    if M * K * 4 > 2 * 1024 * 1024:
        return False
    try:
        return _pick_tiles(K)[1] == K
    except ValueError:
        return False
