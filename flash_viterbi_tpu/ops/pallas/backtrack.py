"""Pallas TPU kernel for the reverse pointer walk (backtrack).

The XLA backtrack (``ops.maxplus.backtrack``) is a ``lax.scan`` whose
every step issues one dependent (K,)-row read from the HBM pointer table
— a serial chain of small DMAs whose latency, not bandwidth, sets the
wall: at T=65536 it is the dominant cost of the one-call fused decode
(the 57 G upd/s long-T row in results/SCALE.md vs 243 G at T=4096).

Here the table is walked in time *chunks*: the grid iterates chunks in
reverse order, Pallas double-buffers the (C, K) pointer block DMA (next
chunk prefetches while the current one is chased), and the pointer chase
itself runs over VMEM — so the whole backtrack is one streamed pass over
the table at HBM bandwidth (~0.3 ms for the 268 MB T=65536/K=1024 table)
instead of T dependent HBM latencies.

The dynamic-lane element read ``row[state]`` is expressed as
``max(where(lane_iota == state, row, -1))`` — Mosaic gathers cannot span
more than one 128-lane vreg, the compare/select/reduce form works for any
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

# chunk DMA budget: (C, K) int32 block, double-buffered by the grid
_CHUNK_BYTES = 2 * 1024 * 1024


def _pick_chunk(Tm: int, K: int) -> int:
    c = max(8, min(512, _CHUNK_BYTES // max(K * 4, 1)))
    c -= c % 8  # int32 sublane tile
    return max(8, min(c, -(-Tm // 8) * 8))


def _bt_kernel(last_ref, ptrs_ref, path_ref, state_ref, *, C: int, K: int,
               R: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        state_ref[0] = last_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    cpos = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def body(i, carry):
        st, acc = carry
        c = C - 1 - i
        row = ptrs_ref[pl.ds(c, 1), :]  # (1, K)
        prev = jnp.max(jnp.where(lane == st, row, jnp.int32(-1)))
        acc = jnp.where(cpos == c, prev, acc)
        return prev, acc

    # grid step 0 chases the LAST chunk, which is ragged when C does not
    # divide T': only its first R rows exist — start the reverse walk there
    # (rows >= R of the edge block are Pallas padding, never read)
    start = jnp.where(g == 0, C - R, 0)
    st, acc = jax.lax.fori_loop(
        start, C, body, (state_ref[0], jnp.zeros((1, C), jnp.int32)))
    path_ref[:] = acc
    state_ref[0] = st


def backtrack_pallas(ptrs: jax.Array, last_state: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Reverse pointer walk on the TPU; drop-in for ``maxplus.backtrack``.

    Args:
      ptrs: (T', K) int32 — row t holds predecessors for the step into t+1.
      last_state: scalar int32 state at the final time.

    Returns:
      (T'+1,) int32 full path including ``last_state``.

    ``last_state`` must be a valid state in [0, K).  Out-of-range values
    diverge from ``maxplus.backtrack`` (whose gather clamps and walks row
    0's chain): here no lane matches, so the walk emits -1 from there on.
    No framework caller passes one (flash_bs's -1 beam-fallout sentinel
    never reaches a backtrack).
    """
    Tm, K = ptrs.shape
    last = jnp.reshape(last_state.astype(jnp.int32), (1,))
    if Tm == 0:
        return last
    C = _pick_chunk(Tm, K)
    G = -(-Tm // C)
    R = Tm - (G - 1) * C  # valid rows in the ragged tail chunk (== C if even)

    kernel = functools.partial(_bt_kernel, C=C, K=K, R=R)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # reverse iteration: grid step g chases chunk G-1-g
            pl.BlockSpec((C, K), lambda g: (G - 1 - g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C), lambda g: (G - 1 - g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, C), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * G * C * K, bytes_accessed=G * C * K * 4,
            transcendentals=0),
        interpret=interpret,
    )(last, ptrs)
    return jnp.concatenate([out.reshape(G * C)[:Tm], last])
