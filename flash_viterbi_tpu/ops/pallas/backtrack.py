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
