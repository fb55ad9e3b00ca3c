"""Pallas TPU kernel for the reverse pointer walk (backtrack).

The XLA backtrack (``ops.maxplus.backtrack``) is a ``lax.scan`` whose
every step issues one dependent (K,)-row read from the HBM pointer table
— a serial chain of small DMAs whose latency, not bandwidth, sets the
wall: at T=65536 it is the dominant cost of the one-call fused decode
(the 57 G upd/s long-T row in results/SCALE.md vs 243 G at T=4096).

Here the table is walked in time *chunks*: the grid iterates chunks in
reverse order, Pallas double-buffers the (C, N, K) pointer block DMA
(next chunk prefetches while the current one is chased), and the pointer
chase itself runs over VMEM — the whole backtrack is one streamed pass
over the table at HBM bandwidth instead of T dependent HBM latencies.

Batching is native: the kernel walks all N lanes of a (T', N, K) pointer
table in one call — the layout ``ops.pallas.maxplus.maxplus_scan``
produces, so FLASH's per-segment walks and the batched fused decode need
no transpose and, critically, no ``vmap``-of-``pallas_call`` (round 2
regression: vmap batches the scalar input into a Mosaic-illegal
``(Squeezed(), 1)`` SMEM block — every batched TPU decode crashed at
trace time).  A ``custom_vmap`` rule keeps external ``jax.vmap`` callers
working by routing them here.

The dynamic-lane element read ``row[state]`` is expressed as
``max(where(lane_iota == state, row, -1))`` — Mosaic gathers cannot span
more than one 128-lane vreg; the compare/select/reduce form works for any
K and costs only ~3K VPU ops per step (negligible against the DMA).

Semantics are bit-identical to ``ops.maxplus.backtrack`` (same carry
chain; reference backtracking ``src/FLASH_Viterbi_multithread.c:186-201``
/ ``vanilla Viterbi.c:167-170``), which the CPU suite checks in
interpret mode and ``tests/test_tpu_hw.py`` on real Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import maxplus as mp

# chunk DMA budget: (C, N, K) int32 block, double-buffered by the grid
_CHUNK_BYTES = 2 * 1024 * 1024
# ceiling for the whole double-buffered pipeline at the minimum C=8
_VMEM_CEIL = 10 * 1024 * 1024


def _pick_chunk(Tm: int, N: int, K: int) -> int:
    c = max(8, min(512, _CHUNK_BYTES // max(N * K * 4, 1)))
    c -= c % 8  # int32 sublane tile
    return max(8, min(c, -(-Tm // 8) * 8))


def backtrack_supported(N: int, K: int) -> bool:
    """True iff the minimum (8, N, K) double-buffered block fits VMEM.
    Shapes that fail route to the XLA reverse scan automatically."""
    return 2 * 8 * N * K * 4 <= _VMEM_CEIL


def _bt_kernel(last_ref, ptrs_ref, path_ref, state_ref, *, C: int, N: int,
               K: int, R: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        state_ref[:] = last_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
    cpos = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1)

    def body(i, carry):
        st, acc = carry  # (N, 1), (N, C)
        c = C - 1 - i
        row = ptrs_ref[pl.ds(c, 1), :, :][0]  # (N, K)
        prev = jnp.max(jnp.where(lane == st, row, jnp.int32(-1)),
                       axis=1, keepdims=True)
        acc = jnp.where(cpos == c, prev, acc)
        return prev, acc

    # grid step 0 chases the LAST chunk, which is ragged when C does not
    # divide T': only its first R rows exist — start the reverse walk there
    # (rows >= R of the edge block are Pallas padding, never read)
    start = jnp.where(g == 0, C - R, 0)
    st, acc = jax.lax.fori_loop(
        start, C, body, (state_ref[:], jnp.zeros((N, C), jnp.int32)))
    path_ref[0] = acc
    state_ref[:] = st


def backtrack_pallas_batched(ptrs: jax.Array, last_states: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """Reverse pointer walk over N independent lanes in one kernel.

    Args:
      ptrs: (T', N, K) int32 — row t holds lane n's predecessors for the
        step into t+1 (the layout ``maxplus_scan`` emits).
      last_states: (N,) int32 states at the final time.

    Returns:
      (N, T'+1) int32 full paths including ``last_states``.

    Every ``last_states[n]`` must be a valid state in [0, K).  Out-of-range
    values diverge from ``maxplus.backtrack`` (whose gather clamps and
    walks row 0's chain): here no lane matches, so the walk emits -1 from
    there on.  No framework caller passes one (flash_bs's -1 beam-fallout
    sentinel never reaches a backtrack).
    """
    Tm, N, K = ptrs.shape
    last = last_states.astype(jnp.int32).reshape(N)
    if Tm == 0:
        return last[:, None]
    if not backtrack_supported(N, K):
        return jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last)
    C = _pick_chunk(Tm, N, K)
    G = -(-Tm // C)
    R = Tm - (G - 1) * C  # valid rows in the ragged tail chunk (== C if even)

    kernel = functools.partial(_bt_kernel, C=C, N=N, K=K, R=R)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((N, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
            # reverse iteration: grid step g chases chunk G-1-g
            pl.BlockSpec((C, N, K), lambda g: (G - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda g: (G - 1 - g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, C), jnp.int32),
        scratch_shapes=[pltpu.VMEM((N, 1), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * G * C * N * K, bytes_accessed=G * C * N * K * 4,
            transcendentals=0),
        interpret=interpret,
    )(last[:, None], ptrs)
    walked = jnp.moveaxis(out, 1, 0).reshape(N, G * C)[:, :Tm]
    return jnp.concatenate([walked, last[:, None]], axis=1)


@functools.lru_cache(maxsize=2)
def _single(interpret: bool):
    """Single-lane entry, per interpret flag; external ``jax.vmap`` routes
    to the batched kernel via custom_vmap (batch canonicalized to axis 0)."""

    @jax.custom_batching.custom_vmap
    def walk(ptrs, last):
        return backtrack_pallas_batched(ptrs[:, None, :], last.reshape(1),
                                        interpret=interpret)[0]

    @walk.def_vmap
    def _rule(axis_size, in_batched, ptrs, last):
        ptrs_b, last_b = in_batched
        if not ptrs_b:
            ptrs = jnp.broadcast_to(ptrs[None], (axis_size,) + ptrs.shape)
        if not last_b:
            last = jnp.broadcast_to(jnp.reshape(last, ()), (axis_size,))
        out = backtrack_pallas_batched(jnp.moveaxis(ptrs, 0, 1),
                                       last.reshape(axis_size),
                                       interpret=interpret)
        return out, True

    return walk


def backtrack_pallas(ptrs: jax.Array, last_state: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Reverse pointer walk on the TPU; drop-in for ``maxplus.backtrack``.

    Args:
      ptrs: (T', K) int32 — row t holds predecessors for the step into t+1.
      last_state: scalar int32 state at the final time.

    Returns:
      (T'+1,) int32 full path including ``last_state``.
    """
    return _single(bool(interpret))(ptrs, last_state.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Recompute-argmax walk: backtrack over a carry HISTORY instead of a pointer
# table (pairs with ops.pallas.maxplus.maxplus_scan_deltas).  Per walked
# step the argmax is recomputed from delta_t plus ONE logA column — SURVEY
# §7's "recompute-argmax-on-backtrack" trade: the N-lane forward scan drops
# its per-cell compare/select chain (the VPU bottleneck of the batched
# decode) and the walk pays only O(T*N*K) recompute work on the path
# itself.  Bit-identical pointers: the walk's sum delta_t[k] + logAT[s, k]
# is the same fp32 pair the forward argmax compared, and
# lowest-index-on-ties matches the scan kernel's cross-tile contract.
#
# Column fetch layout (round 4): logAT is passed as (K, K//128, 128) —
# every transposed row s is its own tile-aligned (K//128, 128) slab, so a
# dynamic leading-index DMA ``logAT_hbm.at[s]`` moves exactly K*4 bytes
# (round 3 used aligned 8-row blocks of the (K//8, 8, K) layout = 8x the
# traffic, because single-row slices of an (8,128)-tiled 2-D memref do not
# lower).  Lanes run as ``fori_loop``s (issue-all then wait+compute) so
# compile time and code size are N-independent — N up to 128 lanes
# compiles where round 3's unrolled per-lane chains capped at 32.
# ---------------------------------------------------------------------------

_WALK_C = 8  # rows per chunk (int32/f32 sublane tile)
_NEG = float("-inf")  # python scalar: kernels may not capture traced consts


# lane loops are python-unrolled up to this N (Mosaic schedules the
# straight-line DMA issues back-to-back; an scf.for serializes them and
# costs per-iteration loop overhead on the walk's per-row critical path);
# above it the fori_loop form keeps compile time and code size bounded
_WALK_UNROLL_N = 16


def _walk_kernel(last_ref, valid_ref, logAT_hbm, deltas_ref, path_ref,
                 states_s, rows_buf, sems, *, C: int, N: int, K: int,
                 masked: bool):
    """DMA variant.  deltas_ref block: (C, N, S, 128) f32 (S = K // 128);
    logAT_hbm: (K, S, 128) slabs in HBM; rows_buf: (N, S, 128) landing
    buffers.  ``masked``: an invalid (row, lane) keeps the lane state
    unchanged — the semantics of the stored-pointer path's identity rows
    (``flash.decode_segments_pointer_pallas``).

    Lane pipelining (round 5): lanes are INDEPENDENT walk chains, so each
    lane issues its NEXT row's column fetch immediately after computing
    its state — lane n's DMA latency hides behind lanes n+1..N's compute
    instead of a per-row issue-all pass paying N serialized scf.for
    iterations (round 4's 23/48 µs/row at N=64/128).  The fetched column
    depends only on the lane state, never the row index, so the prefetch
    stays valid across chunk (grid-step) boundaries; the final grid step
    drains the N dangling prefetches.  The initial issues and the drain
    run python-unrolled: a DMA ``.start()`` inside an ``scf.for`` under
    ``@pl.when`` deadlocks the Mosaic runtime (round-4 fact,
    scripts/beam_dma_probe.py p3)."""
    g = pl.program_id(0)
    S = K // 128
    unroll = N <= _WALK_UNROLL_N

    def lanes(body, acc):
        if unroll:
            for n in range(N):
                acc = body(n, acc)
            return acc
        return jax.lax.fori_loop(0, N, body, acc)

    def copy(n, s):
        return pltpu.make_async_copy(logAT_hbm.at[s], rows_buf.at[n],
                                     sems.at[n])

    @pl.when(g == 0)
    def _():
        for n in range(N):  # unrolled: .start under pl.when must not loop
            states_s[0, n] = last_ref[0, n]
            copy(n, jnp.minimum(last_ref[0, n], K - 1)).start()

    iota_g = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
              + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))
    laneN = jax.lax.broadcasted_iota(jnp.int32, (N, C), 0)
    cpos = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1)

    def row(i, acc):
        r = C - 1 - i

        def lane(n, acc):
            s = jnp.minimum(states_s[0, n], K - 1)  # contract: always < K
            copy(n, s).wait()
            dr = deltas_ref[pl.ds(r, 1), pl.ds(n, 1)][0, 0]  # (S, 128)
            tmp = dr + rows_buf[pl.ds(n, 1)][0]
            m = jnp.max(tmp)
            idx = jnp.min(jnp.where(tmp == m, iota_g, K))
            if masked:
                idx = jnp.where(valid_ref[r, n] > 0, idx, s)
            acc = jnp.where((laneN == n) & (cpos == r), idx, acc)
            states_s[0, n] = idx
            # pipeline: prefetch this lane's next walked column (the
            # buffer read above precedes the start in program order)
            copy(n, jnp.minimum(idx, K - 1)).start()
            return acc

        return lanes(lane, acc)

    if unroll:
        acc = jnp.zeros((N, C), jnp.int32)
        for i in range(C):
            acc = row(i, acc)
        path_ref[0] = acc
    else:
        path_ref[0] = jax.lax.fori_loop(0, C, row,
                                        jnp.zeros((N, C), jnp.int32))

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        for n in range(N):  # unrolled: see the g == 0 block
            copy(n, jnp.minimum(states_s[0, n], K - 1)).wait()


# -inf encode value for the resident variant's exact column select: no
# legitimate log-probability reaches it (f32 logs bottom out near -103),
# and 1.0 * (-3e38) is exact, so `cols == _NEG_ENC` identifies exactly
# the -inf entries of logAT after the one-hot matmul
_NEG_ENC = float(jnp.float32(-3.0e38))


def _walk_kernel_resident(last_ref, valid_ref, logAT_ref, deltas_ref,
                          path_ref, states_v, *, C: int, N: int, K: int,
                          masked: bool):
    """Resident variant: logAT lives in VMEM, and the whole row — column
    select, argmax, state update — is ONE vectorized pass over all N
    lanes, so per-row cost is flat in N (round 5; the round-4 form looped
    a dynamic sublane slice + reduce per lane on the scalar-critical
    path, ~0.36 µs/lane/row).

    The N column reads are an exact one-hot matmul: rows of
    ``oh = (iota == state)`` are exact {0,1}, so ``oh @ logAT_enc``
    reproduces each selected row bit-exactly (every product is 0 or
    1.0*x; the bf16x3 f32-emulation split of x is exact), with logAT's
    -inf entries pre-encoded as ``_NEG_ENC`` (0 * -inf would poison the
    dot with NaN) and restored by compare afterwards.  States stay a
    (N, 1) VMEM vector end to end — no SMEM, no per-lane extracts."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        states_v[:] = last_ref[:]

    iotaNK = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
    cpos = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1)
    eyeN = (jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1))

    def row(i, carry):
        st, acc = carry  # (N, 1) int32, (N, C) int32
        r = C - 1 - i
        oh = (iotaNK == st).astype(jnp.float32)
        # HIGHEST precision is required for bit-exactness: the default
        # single-pass bf16 matmul truncates the selected f32 values; at
        # HIGHEST the bf16x3 split recombines them exactly (the one-hot
        # side is exact {0,1})
        cols = jnp.dot(oh, logAT_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        cols = jnp.where(cols == _NEG_ENC, _NEG, cols)
        dr = deltas_ref[pl.ds(r, 1)][0]  # (N, K)
        tmp = dr + cols
        m = jnp.max(tmp, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(tmp == m, iotaNK, K), axis=1, keepdims=True)
        if masked:
            # the (1, N) valid row lives on lanes; move it to sublanes
            # ((N, 1)) by an eye-masked lane reduce — no relayout op
            vrow = valid_ref[pl.ds(r, 1), :]  # (1, N)
            vcol = jnp.max(jnp.where(eyeN, jnp.broadcast_to(vrow, (N, N)),
                                     0), axis=1, keepdims=True)
            idx = jnp.where(vcol > 0, idx, st)
        acc = jnp.where(cpos == r, idx, acc)
        return (idx, acc)

    st, acc = jax.lax.fori_loop(
        0, C, row, (states_v[:], jnp.zeros((N, C), jnp.int32)))
    path_ref[0] = acc
    states_v[:] = st


def _walk_kernel_resident_small(last_ref, valid_ref, logAT_ref, deltas_ref,
                                path_ref, states_s, *, C: int, N: int,
                                K: int, masked: bool):
    """Resident variant for few lanes at small K: per-lane dynamic
    sublane slices of the VMEM-resident logAT (~0.36 µs/lane/row at
    K=1024) — no DMA chain, and none of the matmul variant's per-row
    MXU launch cost, which dominates at small N (a K=1024 N=1 walk
    measured 3x slower on the matmul path — round-5 regression caught
    by the checkpoint/fused harness rows)."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        for n in range(N):
            states_s[0, n] = last_ref[0, n]

    laneK = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    laneN = jax.lax.broadcasted_iota(jnp.int32, (N, C), 0)
    cpos = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1)

    def row(i, acc):
        r = C - 1 - i
        for n in range(N):
            s = jnp.minimum(states_s[0, n], K - 1)
            col = logAT_ref[pl.ds(s, 1), :]  # (1, K) dynamic sublane read
            dr = deltas_ref[pl.ds(r, 1), pl.ds(n, 1), :][0]  # (1, K)
            tmp = dr + col
            m = jnp.max(tmp)
            idx = jnp.min(jnp.where(tmp == m, laneK, K))
            if masked:
                idx = jnp.where(valid_ref[r, n] > 0, idx, s)
            acc = jnp.where((laneN == n) & (cpos == r), idx, acc)
            states_s[0, n] = idx
        return acc

    acc = jnp.zeros((N, C), jnp.int32)
    for i in range(C):
        acc = row(i, acc)
    path_ref[0] = acc


def _xla_walk_rows(rows, logAT, vrows, state):
    """Walk `rows` (R, N, K) backwards in plain XLA (the < C ragged tail,
    and the whole walk when K is not lane-aligned).  Returns (state before
    the rows, states after each row: tail[i] == path[row0 + 1 + i])."""
    def step(s, x):
        dr, v = x
        t = dr + logAT[s]  # (N, K)
        ns = jnp.argmax(t, axis=1).astype(jnp.int32)
        if v is not None:
            ns = jnp.where(v > 0, ns, s)
        return ns, s

    if vrows is None:
        s, trail = jax.lax.scan(lambda s, dr: step(s, (dr, None)),
                                state, rows[::-1])
    else:
        s, trail = jax.lax.scan(step, state, (rows[::-1], vrows[::-1]))
    return s, trail[::-1]


def argmax_walk_supported(N: int, K: int) -> bool:
    """VMEM bound: double-buffered (C, N, K) delta chunks + the (N, K)
    single-slab column landing buffers must fit.  Budget 32 MB of the
    v5e's 128 MB physical VMEM (the pallas_call sizes its scoped limit
    from the real buffers): 16 lanes at K=16384 (17.8 MB) ride one kernel
    call — at config-5 scale that halves the walk vs 2x8-lane splits."""
    return (K % 128 == 0
            and (2 * _WALK_C * N * K + N * K + 16 * N) * 4
            <= 32 * 1024 * 1024)


def argmax_walk_pallas(deltas: jax.Array, logAT: jax.Array,
                       last_states: jax.Array, valid: jax.Array | None = None,
                       interpret: bool = False) -> jax.Array:
    """Backtrack over the carry history ``deltas`` (T', N, K).

    Args:
      deltas: (T', N, K) f32 — ``deltas[t]`` is the carry BEFORE forward
        step t (``maxplus_scan_deltas``'s second output).
      logAT:  (K, K) f32 — TRANSPOSED transition table (row s = the logA
        column of destination s).
      last_states: (N,) int32 states at the final time.
      valid: optional (T', N) bool — False keeps the lane state unchanged
        at that row (ragged segments; the stored-pointer path's identity
        rows).  None = every row real.

    Returns (N, T'+1) int32 full paths including ``last_states``.
    """
    Tm, N, K = deltas.shape
    last = last_states.astype(jnp.int32).reshape(N)
    if Tm == 0:
        return last[:, None]
    valid_i = None if valid is None else valid.astype(jnp.int32)

    def xla_rows(rows, vrows, state):
        return _xla_walk_rows(rows, logAT, vrows, state)

    if K % 128:
        # the single-slab DMA layout needs lane-aligned K; gated callers
        # (argmax_walk_supported) never get here — direct small-K calls
        # walk on the exact XLA reverse scan instead
        state, tail = _xla_walk_rows(deltas, logAT, valid_i, last)
        return jnp.concatenate([state[:, None], jnp.transpose(tail)], axis=1)

    C = _WALK_C
    G = Tm // C
    rem = Tm - G * C
    state = last  # path[G*C + rem] == path[Tm] on entry
    tail = None
    if rem:
        state, tail = xla_rows(deltas[G * C:],
                               None if valid_i is None else valid_i[G * C:],
                               state)
    # state == path[G*C]; tail[i] == path[G*C + 1 + i] (ends with `last`)
    if G == 0:
        pieces = [state[:, None]]
        if tail is not None:
            pieces.append(jnp.transpose(tail))
        return jnp.concatenate(pieces, axis=1)

    # resident routes: logAT in VMEM kills the per-row DMA chain
    # entirely.  Two variants by lane count (both hw-measured, round 5):
    # few lanes at small K walk fastest on per-lane dynamic slices
    # (~0.36 µs/lane/row at K=1024; the matmul kernel's per-row MXU
    # launch dominates at small N — 3x slower at N=1); many lanes walk
    # fastest on the vectorized one-hot-matmul kernel (flat ~2-9 µs/row
    # to N=128), whose footprint model includes the HIGHEST-precision
    # dot's bf16x3 scoped scratch (~K*K*4 bytes over the f32 table,
    # calibrated against compile-time VMEM OOMs at K=2048/4096).
    # Everything else takes the pipelined DMA kernel (unrolled lanes to
    # N=16, ~0.4 µs/lane/row).
    mm_bytes = (K * K * 8 + (2 * _WALK_C * N * K + 6 * N * K) * 4
                + 12 * 1024 * 1024)
    resident_small = N <= _WALK_UNROLL_N and K <= 1024
    resident_mm = (not resident_small and N > _WALK_UNROLL_N
                   and mm_bytes <= 118 * 1024 * 1024)
    S = K // 128
    if resident_small:
        kernel = functools.partial(_walk_kernel_resident_small, C=C, N=N,
                                   K=K, masked=valid_i is not None)
        in_specs = [
            pl.BlockSpec((1, N), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, N), lambda g: (G - 1 - g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, K), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N, K), lambda g: (G - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        v = (jnp.ones((G * C, N), jnp.int32) if valid_i is None
             else valid_i[:G * C])
        args = (state[None, :], v, logAT, deltas[:G * C])
        out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, N, C), lambda g: (G - 1 - g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, N, C), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1, N), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=3 * G * C * N * K,
                bytes_accessed=G * C * N * (K + K) * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    110 * 1024 * 1024,
                    (K * K + 2 * C * N * K + 2 * N * K) * 4
                    + 8 * 1024 * 1024)),
            interpret=interpret,
        )(*args)
        walked = jnp.moveaxis(out, 1, 0).reshape(N, G * C)
        pieces = [walked, state[:, None]]
        if rem:
            pieces.append(jnp.transpose(tail))
        return jnp.concatenate(pieces, axis=1)
    if resident_mm:
        kernel = functools.partial(_walk_kernel_resident, C=C, N=N, K=K,
                                   masked=valid_i is not None)
        in_specs = [
            pl.BlockSpec((N, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N), lambda g: (G - 1 - g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N, K), lambda g: (G - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        v = (jnp.ones((G * C, N), jnp.int32) if valid_i is None
             else valid_i[:G * C])
        logAT_res = jnp.where(jnp.isneginf(logAT), jnp.float32(_NEG_ENC),
                              logAT)
        args = (state[:, None], v, logAT_res, deltas[:G * C])
        scratch = [pltpu.VMEM((N, 1), jnp.int32)]
        out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, N, C), lambda g: (G - 1 - g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, N, C), jnp.int32),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=3 * G * C * N * K,
                bytes_accessed=G * C * N * (K + K) * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=mm_bytes),
            interpret=interpret,
        )(*args)
        walked = jnp.moveaxis(out, 1, 0).reshape(N, G * C)
        pieces = [walked, state[:, None]]
        if rem:
            pieces.append(jnp.transpose(tail))
        return jnp.concatenate(pieces, axis=1)
    kernel = functools.partial(_walk_kernel, C=C, N=N, K=K,
                               masked=valid_i is not None)
    in_specs = [
        pl.BlockSpec((1, N), lambda g: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((C, N), lambda g: (G - 1 - g, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # logAT slabs stay in HBM
        pl.BlockSpec((C, N, S, 128), lambda g: (G - 1 - g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    v = (jnp.ones((G * C, N), jnp.int32) if valid_i is None
         else valid_i[:G * C])
    args = (state[None, :], v, logAT.reshape(K, S, 128),
            deltas[:G * C].reshape(G * C, N, S, 128))
    scratch = [
        pltpu.SMEM((1, N), jnp.int32),
        pltpu.VMEM((N, S, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((N,)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, C), lambda g: (G - 1 - g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, C), jnp.int32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=3 * G * C * N * K,
            bytes_accessed=G * C * N * (K + K) * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                110 * 1024 * 1024,
                (2 * C * N * K + 5 * N * K) * 4 + 8 * 1024 * 1024)),
        interpret=interpret,
    )(*args)
    walked = jnp.moveaxis(out, 1, 0).reshape(N, G * C)  # path[0..G*C-1]
    pieces = [walked, state[:, None]]  # + path[G*C]
    if rem:
        pieces.append(jnp.transpose(tail))  # path[G*C+1 .. Tm] (ends last)
    return jnp.concatenate(pieces, axis=1)
