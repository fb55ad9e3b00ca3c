"""Multi-chip FLASH decode: ``shard_map`` over a ``(data, seq, state)`` mesh.

The reference's only parallel runtime is a pthread work queue over time
intervals (``src/FLASH_Viterbi_multithread.c:264-335``).  The TPU-native
replacement (SURVEY.md §2.6/§2.7) has no scheduler at all — three static
mesh axes carry all the parallelism, with XLA collectives over ICI:

* ``data``  — batch of independent sequences (the reference decodes one
  sequence per process; batching is free on TPU).
* ``seq``   — FLASH's sequence parallelism: phase-2 segments are divided
  statically among the ``seq`` devices; each decodes its forced-boundary
  segments locally and the path is combined with one ``psum`` scatter.
* ``state`` — tensor parallelism over the state dimension, needed once
  ``log A`` outgrows one chip (K=16384 → 1 GiB fp32): each device holds a
  column block ``logA[:, shard]`` and the matching row block of ``logB``,
  computes its slice of every max-plus matvec, and the K-vector carries
  (scores + argmax pointers) are rebuilt with a tiled ``all_gather`` —
  O(K) bytes per trellis step on ICI, negligible against the K²/s compute.

Pipeline/expert parallelism have no analog here (no layered model, no
experts — SURVEY.md §2.6 rows 4-5).

The decode itself is the same two-phase anchored scheme as
``algorithms.flash`` (phase-1 multi-anchor pass, phase-2 per-segment
pointer decode), so paths are bit-identical to the single-chip decoder.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..algorithms.flash import flash_midpoints
from ..ops import maxplus as mp

AXES = ("data", "seq", "state")


def make_mesh(n_data: int = 1, n_seq: int = 1, n_state: int = 1, devices=None) -> Mesh:
    """Build a (data, seq, state) mesh from the first n_data*n_seq*n_state devices."""
    need = n_data * n_seq * n_state
    devices = list(jax.devices() if devices is None else devices)[:need]
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(n_data, n_seq, n_state), AXES)


def mesh_shape_for(n_devices: int) -> tuple[int, int, int]:
    """Factor a device count into a (data, seq, state) mesh shape.

    Prime factors are dealt round-robin to (state, seq, data) so every axis
    is exercised when the count allows (8 → 2×2×2, 4 → 1×2×2, 2 → 1×1×2).
    """
    dims = [1, 1, 1]  # data, seq, state
    n = n_devices
    order = [2, 1, 0]  # state first, then seq, then data
    i = 0
    f = 2
    while n > 1:
        while n % f:
            f += 1
        dims[order[i % 3]] *= f
        n //= f
        i += 1
    return tuple(dims)


# ---------------------------------------------------------------------------
# State-sharded max-plus primitives (inside shard_map)
# ---------------------------------------------------------------------------

def _ag(x):
    """Rebuild a full K-vector from per-device state shards (tiled ICI gather)."""
    return jax.lax.all_gather(x, "state", tiled=True)


def _sharded_step(delta_full, logA_l, emit_l):
    """One max-plus trellis step with logA column-sharded over 'state'.

    delta_full: (K,) replicated; logA_l: (K, K/s); emit_l: (K/s,).
    Returns replicated (delta' (K,), ptr (K,) int32 global source indices).
    """
    scores = delta_full[:, None] + logA_l  # (K, K/s)
    d_l = jnp.max(scores, axis=0) + emit_l
    p_l = jnp.argmax(scores, axis=0).astype(jnp.int32)
    return _ag(d_l), _ag(p_l)


def _phase1_sharded(logA_l, logPi_l, emits_l, mids: list[int], T: int):
    """Multi-anchor forward pass, state-sharded (cf. algorithms.flash.phase1_anchors)."""
    nP = len(mids)
    delta0 = _ag(logPi_l + emits_l[0])
    K = delta0.shape[0]
    planes0 = jnp.zeros((nP, K), dtype=jnp.int32)
    prop = jnp.asarray(
        np.asarray([[j > m + 1 for m in mids] for j in range(1, T)], dtype=bool)
        if nP else np.zeros((T - 1, 0), dtype=bool)
    )

    def step(carry, x):
        delta, planes = carry
        emit_l, pr = x
        d, arg = _sharded_step(delta, logA_l, emit_l)
        if nP:
            moved = jnp.take_along_axis(planes, arg[None, :], axis=1)
            planes = jnp.where(pr[:, None], moved, arg[None, :])
        return (d, planes), None

    (delta, planes), _ = jax.lax.scan(step, (delta0, planes0), (emits_l[1:], prop))
    last = jnp.argmax(delta).astype(jnp.int32)
    anchors = planes[:, last] if nP else jnp.zeros((0,), jnp.int32)
    return last, anchors


def _segment_path(logA_l, logPi_l, emits_l, start, nsteps, init_state, end_state,
                  is_first, Lmax: int, T: int):
    """Forced-boundary pointer decode of one segment, state-sharded."""
    K = logA_l.shape[0]
    idx = jnp.minimum(start + jnp.arange(Lmax), T - 1)
    seg_emits_l = emits_l[idx]  # (Lmax, K/s)
    d0 = _ag(jnp.where(is_first, logPi_l, logA_l[init_state]) + seg_emits_l[0])
    iota = jnp.arange(K, dtype=jnp.int32)

    def step(delta, x):
        emit_l, valid = x
        d, p = _sharded_step(delta, logA_l, emit_l)
        d = jnp.where(valid, d, delta)
        p = jnp.where(valid, p, iota)
        return d, p

    valid = jnp.arange(1, Lmax) <= nsteps
    _, ptrs = jax.lax.scan(step, d0, (seg_emits_l[1:], valid))  # (Lmax-1, K)
    return mp.backtrack(ptrs, end_state)  # (Lmax,)


def _decode_one_local(logA_l, logB_l, logPi_l, y, starts, lens, mids: list[int],
                      spd: int, Lmax: int, T: int):
    """Decode one sequence: phase 1 (replicated over 'seq'), then this seq
    device's ``spd`` segments, scatter + psum over 'seq'."""
    emits_l = logB_l[:, y].T  # (T, K/s)
    last, anchors = _phase1_sharded(logA_l, logPi_l, emits_l, mids, T)
    init_states = jnp.concatenate([jnp.zeros((1,), jnp.int32), anchors])
    end_states = jnp.concatenate([anchors, last[None]])

    rank = jax.lax.axis_index("seq")
    s0 = rank * spd
    st_loc = jax.lax.dynamic_slice(starts, (s0,), (spd,))
    ln_loc = jax.lax.dynamic_slice(lens, (s0,), (spd,))
    in_loc = jax.lax.dynamic_slice(init_states, (s0,), (spd,))
    en_loc = jax.lax.dynamic_slice(end_states, (s0,), (spd,))
    first = (s0 + jnp.arange(spd, dtype=jnp.int32)) == 0

    seg = partial(_segment_path, logA_l, logPi_l, emits_l, Lmax=Lmax, T=T)
    paths = jax.vmap(lambda a, b, c, d, e: seg(a, b, c, d, e))(
        st_loc, ln_loc - 1, in_loc, en_loc, first
    )  # (spd, Lmax)

    pos = st_loc[:, None] + jnp.arange(Lmax)[None, :]
    pos = jnp.where(jnp.arange(Lmax)[None, :] < ln_loc[:, None], pos, T)
    out = jnp.zeros((T,), jnp.int32).at[pos.reshape(-1)].set(
        paths.reshape(-1), mode="drop"
    )
    return jax.lax.psum(out, "seq")


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def flash_decode_sharded(mesh: Mesh, logA, logB, logPi, ys, num_segments: int | None = None):
    """Batched multi-chip FLASH decode.

    Args:
      mesh: a (data, seq, state) mesh from :func:`make_mesh`.
      logA/logB/logPi: log tables (padded so K divides mesh 'state' size).
      ys: (Bs, T) int32 observation batch (Bs divides mesh 'data' size).
      num_segments: total phase-2 segments; must be a multiple of the 'seq'
        axis size (default: one segments-per-device multiple that keeps
        segments ≥ 2 steps).

    Returns:
      (Bs, T) int32 decoded paths, bit-identical to ``algorithms.flash``
      pointer mode with the same segment count.
    """
    n_seq = mesh.shape["seq"]
    n_state = mesh.shape["state"]
    Bs, T = ys.shape
    K = logA.shape[0]
    if K % n_state:
        raise ValueError(f"padded K={K} must divide state axis {n_state}")
    if Bs % mesh.shape["data"]:
        raise ValueError(f"batch {Bs} must divide data axis {mesh.shape['data']}")

    N = num_segments if num_segments is not None else n_seq * max(1, min(4, T // (2 * n_seq)))
    if N % n_seq:
        raise ValueError(f"num_segments={N} must be a multiple of seq axis {n_seq}")
    if T < 2 * N:
        raise ValueError(f"T={T} too short for {N} segments")
    spd = N // n_seq

    mids = flash_midpoints(0, T - 1, N) if N > 1 else []
    starts_l = [0] + [m + 1 for m in mids]
    ends_l = mids + [T - 1]
    starts = jnp.asarray(starts_l, jnp.int32)
    lens = jnp.asarray([e - s + 1 for s, e in zip(starts_l, ends_l)], jnp.int32)
    Lmax = int(max(e - s + 1 for s, e in zip(starts_l, ends_l)))

    def local_fn(logA_l, logB_l, logPi_l, ys_l):
        return jax.vmap(
            lambda y: _decode_one_local(
                logA_l, logB_l, logPi_l, y, starts, lens, mids, spd, Lmax, T
            )
        )(ys_l)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, "state"), P("state", None), P("state"), P("data", None)),
        out_specs=P("data", None),
        # all_gather'd carries are value-replicated over 'state' but JAX's
        # varying-manual-axes analysis can't prove it; skip the check.
        check_vma=False,
    )
    return jax.jit(fn)(logA, logB, logPi, ys)
