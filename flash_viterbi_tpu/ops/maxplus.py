"""Tropical (max-plus) trellis primitives — the framework's core math.

One Viterbi trellis step is a max-plus matvec with an argmax witness::

    delta'[i] = max_k ( delta[k] + logA[k, i] ) + logB[i, y_t]
    ptr[i]    = argmin-index k attaining the max (lowest k on ties)

The fp32 evaluation order — inner sum ``delta + logA``, emission added
*after* the max — is the framework's numerics contract (matches
``oracle.reference`` ``numerics="f32"``).  The emission term is constant
over the source index k, so the argmax is unchanged in exact arithmetic vs
the reference C's in-loop 3-term sum (``src/FLASH_Viterbi_multithread.c:170``,
which computes in double and truncates once — both orders are equally close
to it); hoisting it out of the K² inner loop removes a full K×K add per
trellis step and is the layout the Pallas kernel wants.
``jnp.argmax`` returns the first occurrence, matching the reference's
strict-``>`` scans (SURVEY.md §3.6).

These are the pure-XLA definitions; ``ops.pallas`` provides fused TPU
kernels with identical semantics, selected by the dispatch in
``algorithms``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def maxplus_step(delta: jax.Array, logA: jax.Array, emit: jax.Array):
    """One trellis step.

    Args:
      delta: (K,) fp32 scores at time t-1.
      logA:  (K, K) fp32 log transition matrix (source k rows, dest i cols).
      emit:  (K,) fp32 log emission column ``logB[:, y_t]``.

    Returns:
      (delta', ptr): (K,) fp32 new scores and (K,) int32 argmax witnesses.
    """
    scores = delta[:, None] + logA  # (k_src, i_dst)
    return jnp.max(scores, axis=0) + emit, jnp.argmax(scores, axis=0).astype(jnp.int32)


def maxplus_step_noptr(delta: jax.Array, logA: jax.Array, emit: jax.Array):
    """Pointer-free step (for score-only passes, e.g. checkpoint forward)."""
    scores = delta[:, None] + logA
    return jnp.max(scores, axis=0) + emit


def init_delta(logPi: jax.Array, logB: jax.Array, y0: jax.Array) -> jax.Array:
    """delta_0 = logPi + logB[:, y_0]  (reference :142)."""
    return logPi + logB[:, y0]


def forced_delta(logA: jax.Array, logB: jax.Array, state, y_t) -> jax.Array:
    """delta at segment entry forced from a known previous state
    (reference :147-151): logA[state, :] + logB[:, y_t]."""
    return logA[state, :] + logB[:, y_t]


def forward_scan(delta0: jax.Array, logA: jax.Array, emits: jax.Array):
    """Forward pass over a whole (sub)sequence, materializing pointers.

    Args:
      delta0: (K,) initial scores (time of ``emits`` row -1).
      emits:  (T', K) log emission rows for times 1..T'.

    Returns:
      (delta_final (K,), ptrs (T', K) int32).
    """

    def step(delta, emit):
        d, p = maxplus_step(delta, logA, emit)
        return d, p

    return jax.lax.scan(step, delta0, emits)


def forward_scan_noptr(delta0: jax.Array, logA: jax.Array, emits: jax.Array):
    """Score-only forward pass; optionally returns per-step deltas."""

    def step(delta, emit):
        d = maxplus_step_noptr(delta, logA, emit)
        return d, None

    delta, _ = jax.lax.scan(step, delta0, emits)
    return delta


def backtrack(ptrs: jax.Array, last_state: jax.Array) -> jax.Array:
    """Reverse pointer walk.

    Args:
      ptrs: (T', K) int32, row t holds predecessors for the step into time t+1.
      last_state: scalar int32 state at the final time.

    Returns:
      (T'+1,) int32 full path including ``last_state``.
    """

    def step(state, ptr_row):
        prev = ptr_row[state]
        return prev, prev

    _, path = jax.lax.scan(step, last_state, ptrs, reverse=True)
    return jnp.concatenate([path, last_state[None]])


def argmax_final(delta: jax.Array) -> jax.Array:
    """Lowest-index argmax of the final scores (reference :186-196)."""
    return jnp.argmax(delta).astype(jnp.int32)


def path_score(logA, logB, logPi, y, path) -> jax.Array:
    """Log-likelihood of a state path (for cross-implementation invariants)."""
    e = logPi[path[0]] + logB[path[0], y[0]]
    trans = logA[path[:-1], path[1:]]
    emits = logB[path[1:], y[1:]]
    return e + jnp.sum(trans + emits)
