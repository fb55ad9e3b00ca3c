"""Fused Pallas beam-scan kernel: the whole top-B forward recursion in one
``pallas_call``.

The XLA beam step (``algorithms/flash_bs.beam_step``) is latency-bound,
not bandwidth-bound: per trellis step it pays a row gather (B rows =
~1 MB at K=4096, ~1.2 us at HBM speed), a (B, K) reduce and a ``top_k``
as separate fused loops with XLA's per-op scheduling — ~10-14 us/step
measured.  This kernel keeps the entire time loop on-chip:

* grid = (T-1,); TPU grids run sequentially, so the beam (values in VMEM,
  state ids in SMEM) carries across steps in scratch;
* the B beam rows of ``logA`` stay in HBM (``memory_space=ANY``) and are
  fetched per step with B concurrent dynamic DMAs of tiling-ALIGNED
  8-row blocks (single-row slices of a large (8,128)-tiled HBM memref do
  not lower), the wanted row selected on the VPU — 8*B*K*4 bytes/step of
  HBM traffic vs the dense kernel's K*K*4 (K/(8B) times less);
* top-B selection is B iterations of masked max + lowest-index extract
  (exactly ``jax.lax.top_k``'s descending, index-stable order — the
  "taken" mask keeps indices distinct even among -inf ties);
* per-step outputs are the beam history (T-1, B) state ids and the
  winning-slot pointers (T-1, B) — the O(T*B) beam memory contract;
* optionally, FLASH-BS's P anchor planes ((P, B) int32: state at anchor
  time per beam slot) fold in-kernel — the record/propagate recurrence is
  a lane gather by the winning slots (B <= 128 lanes = one vreg).

This is the TPU analog of the reference FPGA's dual-heap ping-pong
(HEAP_1/HEAP_2 + HEAP_SELECT units, SURVEY.md §2.5 row 17): the heap is
replaced by a sorted beam register file selected on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")  # python scalar: kernels may not capture traced constants


def _beam_scan_kernel(vals0_ref, states0_ref, states0v_ref, prop_ref,
                      emits_ref, logA_hbm,
                      hist_ref, slots_ref, planes_ref,
                      vals_s, states_s, rows8_buf, rows_buf, prev_sv,
                      planes_s, sems,
                      *, B: int, K: int, P: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_s[:] = vals0_ref[:]            # (B, 1) f32
        # SMEM moves must be scalar (Mosaic rejects vector SMEM loads);
        # unrolled B scalar copies, executed once at t == 0 only
        for b in range(B):
            states_s[0, b] = states0_ref[0, b]
        prev_sv[:] = states0v_ref[:]        # (1, B) int32 VMEM
        if P:
            planes_s[:] = jnp.full((P, B), -1, jnp.int32)

    # fetch the B beam rows concurrently.  A single-row slice of a large
    # (8,128)-tiled HBM memref does not lower ("slice shape along dim 0
    # must be aligned to tiling (8)") — logA arrives reshaped (K//8, 8, K)
    # so each DMA moves one ALIGNED 8-row block, and the wanted row is
    # selected on the VPU (8x the minimum DMA traffic, still K/8th of the
    # dense kernel's).
    for b in range(B):
        pltpu.make_async_copy(logA_hbm.at[states_s[0, b] // 8],
                              rows8_buf.at[b], sems.at[b]).start()
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, K), 0)
    for b in range(B):
        pltpu.make_async_copy(logA_hbm.at[states_s[0, b] // 8],
                              rows8_buf.at[b], sems.at[b]).wait()
        r = states_s[0, b] % 8
        rows_buf[pl.ds(b, 1), :] = jnp.max(
            jnp.where(sub == r, rows8_buf[b], NEG), axis=0, keepdims=True)

    tmp = vals_s[:] + rows_buf[:]         # (B, K)
    maxv = jnp.max(tmp, axis=0, keepdims=True)          # (1, K)
    iotaB = jax.lax.broadcasted_iota(jnp.int32, (B, K), 0)
    slot = jnp.min(jnp.where(tmp == maxv, iotaB, B), axis=0, keepdims=True)
    full = maxv + emits_ref[0]            # (1, K)

    # top-B extraction: masked max + lowest-index, distinct via `taken`
    iotaK = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    iotaB1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    taken = jnp.zeros((1, K), jnp.bool_)
    sv = jnp.zeros((1, B), jnp.int32)
    slv = jnp.zeros((1, B), jnp.int32)
    vv = jnp.zeros((1, B), jnp.float32)
    for b in range(B):
        masked = jnp.where(taken, NEG, full)
        m = jnp.max(masked)
        cand = jnp.where(jnp.logical_and(masked == m,
                                         jnp.logical_not(taken)), iotaK, K)
        idx = jnp.min(cand)
        taken = jnp.logical_or(taken, iotaK == idx)
        states_s[0, b] = idx
        # winning old-beam slot of this new beam entry: slot[idx]
        sb = jnp.min(jnp.where(iotaK == idx, slot, B))
        sv = jnp.where(iotaB1 == b, idx, sv)
        slv = jnp.where(iotaB1 == b, sb, slv)
        vv = jnp.where(iotaB1 == b, m, vv)
    # one vector store each (per-lane scalar VMEM stores don't lower)
    hist_ref[0] = sv
    slots_ref[0] = slv
    vals_s[:] = jnp.transpose(vv)

    if P:
        # anchor-plane recurrence (flash_bs._phase1_beam): record the old
        # beam's states at anchor steps, propagate by winning slot after.
        # Lane gathers (take_along_axis) don't lower on Mosaic — use the
        # compare/select/reduce form: selT[j, b] == (j == slv[0, b]), and
        # exactly one j matches per b (slot is always found), so the
        # masked max IS the gather (fill -1 == the planes' unset value).
        selT = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
                == jnp.broadcast_to(slv, (B, B)))
        fill = jnp.full((B, B), -1, jnp.int32)

        def lane_pick(row):  # row: (1, B) -> picked (1, B): out[b] = row[slv[b]]
            col = jnp.broadcast_to(jnp.transpose(row), (B, B))
            return jnp.max(jnp.where(selT, col, fill), axis=0, keepdims=True)

        moved = jnp.concatenate(
            [lane_pick(planes_s[pl.ds(p, 1), :]) for p in range(P)], axis=0)
        rec = lane_pick(prev_sv[:])  # (1, B)
        prop_col = prop_ref[0]  # (P, 1)
        planes_s[:] = jnp.where(prop_col > 0, moved,
                                jnp.broadcast_to(rec, (P, B)))

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            planes_ref[:] = planes_s[:]
    prev_sv[:] = sv


def _call(logA, emits, vals0, states0, prop, P: int, interpret: bool):
    Tm, K = emits.shape
    B = vals0.shape[0]
    Pp = max(P, 1)
    kernel = functools.partial(_beam_scan_kernel, B=B, K=K, P=P)
    # time-major inputs/outputs use 3-D (1, x, y) blocks whose LAST TWO
    # dims equal the array dims — a 2-D (1, x) block over a (Tm, x) array
    # violates Mosaic's sublane rule (round-2 lowering failure)
    hist, slots, planes = pl.pallas_call(
        kernel,
        grid=(Tm,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # logA stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tm, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((Tm, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((Pp, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),   # beam values
            pltpu.SMEM((1, B), jnp.int32),     # beam state ids
            pltpu.VMEM((B, 8, K), jnp.float32),  # aligned 8-row DMA blocks
            pltpu.VMEM((B, K), jnp.float32),   # selected beam rows
            pltpu.VMEM((1, B), jnp.int32),     # previous beam states (vector)
            pltpu.VMEM((Pp, B), jnp.int32),    # anchor planes
            pltpu.SemaphoreType.DMA((B,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tm * B * K,
            bytes_accessed=Tm * (8 * B * K * 4 + K * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(vals0[:, None], states0[None, :], states0[None, :],
      prop[:, :, None], emits[:, None, :], logA.reshape(K // 8, 8, K))
    return hist[:, 0, :], slots[:, 0, :], planes


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_scan(logA, emits, vals0, states0, interpret: bool = False):
    """Run the fused beam forward scan (no anchor planes).

    Args:
      logA:   (K, K) fp32 (stays in HBM; rows DMA'd on demand).
      emits:  (T', K) fp32 log emission rows for steps 1..T'.
      vals0:  (B,) fp32 initial beam scores (descending).
      states0:(B,) int32 initial beam states.

    Returns:
      (hist (T', B) int32 beam states per step,
       slots (T', B) int32 winning previous-beam slot per new entry).

    Input contract: finite or -inf scores only — a NaN anywhere in ``logA``
    or ``emits`` breaks the masked-max top-B extraction (every comparison
    is false, idx saturates to K).  Framework table builders map zero
    probabilities to -inf and never produce NaN (``models/hmm.py``).
    """
    Tm = emits.shape[0]
    B = vals0.shape[0]
    if Tm == 0:  # zero-step scan (T=1 decode): nothing to walk
        z = jnp.zeros((0, B), jnp.int32)
        return z, z
    prop = jnp.zeros((Tm, 1), jnp.int32)
    hist, slots, _ = _call(logA, emits, vals0, states0, prop, 0, interpret)
    return hist, slots


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_scan_planes(logA, emits, vals0, states0, prop, interpret: bool = False):
    """Beam scan with FLASH-BS anchor planes folded in-kernel.

    ``prop``: (T', P) int32 — nonzero means "propagate plane by winning
    slot", zero means "record the previous beam's states" (the reference's
    record-at-j==mid+1 contract, ``_phase1_beam``).

    Returns (hist, slots, planes (P, B) int32 at the final step).

    Same no-NaN input contract as :func:`beam_scan`.
    """
    P = prop.shape[1]
    Tm = emits.shape[0]
    B = vals0.shape[0]
    if Tm == 0:  # zero-step scan: planes were never recorded
        z = jnp.zeros((0, B), jnp.int32)
        return z, z, jnp.full((P, B), -1, jnp.int32)
    return _call(logA, emits, vals0, states0, prop, P, interpret)


def beam_kernel_supported(K: int, B: int) -> bool:
    """Lane-gather and VMEM bounds: beam fits one vreg's lanes; row DMAs
    need lane-aligned K; the (B, 8, K) aligned-block buffer + (B, K) row
    buffer must fit VMEM comfortably (~16 MB/core)."""
    return B <= 128 and K % 128 == 0 and 9 * B * K * 4 <= 12 * 1024 * 1024
