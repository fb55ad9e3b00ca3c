"""Fused Pallas beam-scan kernel: the whole top-B forward recursion in one
``pallas_call``.

This is the TPU analog of the reference FPGA's dual-heap ping-pong
(HEAP_1/HEAP_2 + HEAP_SELECT units, SURVEY.md §2.5 row 17, reference
``src/FLASH_BS_Viterbi_multithread.c:51-211``): the heap is replaced by a
sorted beam register file extracted on the VPU.

Design (round 4, measured on a v5e chip — scripts/beam_profile*.py):

* grid = (T-1,); TPU grids run sequentially, so the beam (values and
  state ids in SMEM) carries across steps in scratch;
* the B beam rows of ``logA`` stay in HBM and are fetched per step with B
  concurrent single-row DMAs: ``logA`` arrives reshaped (K, K//128, 128)
  so every row is its own tile-aligned (K//128, 128) slab and a dynamic
  leading-index DMA moves exactly K*4 bytes (round 3's (K//8, 8, K)
  aligned-block layout moved 8x that, because single-row slices of an
  (8,128)-tiled 2-D memref do not lower);
* top-B extraction = B iterations of masked max + min over a PACKED code
  (idx*256 + source-slot): one min-reduction yields the winning index AND
  its backtrack slot — identical lowest-index tie semantics as
  ``jax.lax.top_k``'s descending, index-stable order (the "taken" mask
  keeps indices distinct even among -inf ties);
* per-step outputs are the beam history (T-1, B) state ids and the
  winning-slot pointers (T-1, B) — the O(T*B) beam memory contract;
* optionally, FLASH-BS's P anchor planes ((P, B) int32: state at anchor
  time per beam slot) fold in-kernel — the record/propagate recurrence is
  a lane gather by the winning slots (B <= 128 lanes = one vreg).

Honest verdict (kept current in results/SCALE.md): at the headline
K=3965/B=64/T=256 this kernel measures 7.9 ms bit-exact — 36% faster
than round 3's 10.7 ms — but XLA's beam path measures 3.3 ms and stays
the default.  The binding constraint is NOT memory traffic (the 8x DMA
fix moved the wall < 1 ms; measured DMA cost is ~1.8 of ~39 us/step):
it is the B-deep serial chain of dependent masked-max extractions, where
XLA's fused native top_k beats every Pallas formulation tried — masked
max+min (this kernel), a roll-butterfly tournament (slower: rolls lower
as full cross-lane permutes), and block-max prefolds (kept, −15%).
Per-iteration attribution lives in scripts/beam_profile2.py.
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
                      vals_s, states_s, rows_buf, prev_sv,
                      planes_s, sems,
                      *, B: int, K: int, P: int):
    t = pl.program_id(0)
    S = K // 128
    nsteps = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        def cp(b, c):
            # SMEM moves must be scalar (Mosaic rejects vector SMEM loads)
            vals_s[0, b] = vals0_ref[0, b]
            states_s[0, b] = states0_ref[0, b]
            return c

        jax.lax.fori_loop(0, B, cp, 0)
        prev_sv[:] = states0v_ref[:]        # (1, B) int32 VMEM
        if P:
            planes_s[:] = jnp.full((P, B), -1, jnp.int32)

    # fetch the B beam rows concurrently (single tile-aligned slab each).
    # NOTE the issue loop is unconditional at the top of every step: DMAs
    # started inside an scf.for under @pl.when deadlock on this Mosaic
    # (isolated by scripts/beam_dma_probe.py p3), so the overlapped
    # issue-from-pick design is off the table.
    def issue(b, c):
        pltpu.make_async_copy(logA_hbm.at[states_s[0, b]],
                              rows_buf.at[b], sems.at[b]).start()
        return c

    jax.lax.fori_loop(0, B, issue, 0)

    iota_g = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
              + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))

    # incremental max over beam slots: strict '>' keeps the LOWEST slot on
    # ties — same winner as an explicit min-index extraction.  The == arm
    # only fires while slot is unset (B), so an all--inf column reports
    # slot 0 like the explicit form did.
    def fold(b, carry):
        maxv, slot = carry
        pltpu.make_async_copy(logA_hbm.at[states_s[0, b]], rows_buf.at[b],
                              sems.at[b]).wait()
        cand = rows_buf[pl.ds(b, 1)][0] + vals_s[0, b]
        upd = (cand > maxv) | ((cand == maxv) & (slot == B))
        return jnp.where(upd, cand, maxv), jnp.where(upd, b, slot)

    maxv, slot = jax.lax.fori_loop(
        0, B, fold,
        (jnp.full((S, 128), NEG, jnp.float32),
         jnp.full((S, 128), B, jnp.int32)))
    full = maxv + emits_ref[0]            # (S, 128)

    # top-B extraction: masked max + min packed code.  code = idx*256 +
    # slot (slot <= 128 fits 8 bits; the tie order of code equals the tie
    # order of idx), so ONE min-reduction yields the winning index AND its
    # source slot — round 3 paid a third dependent reduction for the slot
    # (measured at ~8 us/step of pure latency, scripts/beam_profile2.py).
    # `taken` carried as int32: a bool-vector scf.for carry does not
    # legalize in Mosaic (i1 mask packing).  A roll-butterfly tournament
    # variant measured SLOWER than these two reductions on v5e (14.6 vs
    # 11.1 ms full decode) — rolls lower as full cross-lane permutes.
    iotaB1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    BIG = jnp.int32(2**30)
    code0 = iota_g * 256 + slot

    def pick(b, carry):
        taken, sv = carry
        free = taken == 0
        masked = jnp.where(free, full, jnp.float32(NEG))
        if S % 8 == 0 and S > 8:
            # fold to one (8, 128) vreg first: shrinks the max-reduce tree
            # (measured 29.1 -> 24.5 us/step at S=32)
            bm = masked[0:8]
            for blk in range(1, S // 8):
                bm = jnp.maximum(bm, masked[8 * blk:8 * (blk + 1)])
            m = jnp.max(bm)
        else:
            m = jnp.max(masked)
        cand = jnp.where(jnp.logical_and(masked == m, free), code0, BIG)
        cw = jnp.min(cand)
        taken = jnp.where(code0 == cw, 1, taken)
        sv = jnp.where(iotaB1 == b, cw, sv)
        states_s[0, b] = cw // 256
        vals_s[0, b] = m
        return taken, sv

    _, sv = jax.lax.fori_loop(
        0, B, pick, (jnp.zeros((S, 128), jnp.int32),
                     jnp.zeros((1, B), jnp.int32)))
    sv, slv = sv // 256, sv % 256
    # one vector store each (per-lane scalar VMEM stores don't lower)
    hist_ref[0] = sv
    slots_ref[0] = slv

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
    if B > 128:
        # one vreg of lanes per heap plane, and packed codes reserve 8
        # bits for the slot — larger beams would silently corrupt codes
        # on the explicit use_pallas=True path (ADVICE r4)
        raise ValueError(f"beam kernel supports B <= 128, got B={B}; "
                         "use the XLA beam path (use_pallas=False)")
    if K % 128:
        # pad the state space to the lane tile: padded states score -inf
        # everywhere, and a real index (even an -inf tie) always has a
        # lower index than a padded one, so the top-B never admits padding
        Kp = -(-K // 128) * 128
        logA = jnp.pad(logA, ((0, Kp - K), (0, Kp - K)),
                       constant_values=NEG)
        emits = jnp.pad(emits, ((0, 0), (0, Kp - K)), constant_values=NEG)
        K = Kp
    S = K // 128
    Pp = max(P, 1)
    kernel = functools.partial(_beam_scan_kernel, B=B, K=K, P=P)
    # time-major inputs/outputs use 3-D (1, x, y) blocks whose LAST TWO
    # dims equal the array dims — a 2-D (1, x) block over a (Tm, x) array
    # violates Mosaic's sublane rule (round-2 lowering failure)
    hist, slots, planes = pl.pallas_call(
        kernel,
        grid=(Tm,),
        in_specs=[
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # logA slabs stay in HBM
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
            pltpu.SMEM((1, B), jnp.float32),     # beam values
            pltpu.SMEM((1, B), jnp.int32),       # beam state ids
            pltpu.VMEM((B, S, 128), jnp.float32),  # single-row DMA slabs
            pltpu.VMEM((1, B), jnp.int32),       # previous beam states
            pltpu.VMEM((Pp, B), jnp.int32),      # anchor planes
            pltpu.SemaphoreType.DMA((B,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Tm * B * K,
            bytes_accessed=Tm * (B * K * 4 + K * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(vals0[None, :], states0[None, :], states0[None, :],
      prop[:, :, None], emits.reshape(Tm, S, 128), logA.reshape(K, S, 128))
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
    """Lane-gather and VMEM bounds: beam fits one vreg's lanes; single-slab
    row DMAs need lane-aligned K; the (B, K//128, 128) landing buffer must
    fit VMEM comfortably (~16 MB/core)."""
    return B <= 128 and K % 128 == 0 and B * K * 4 <= 12 * 1024 * 1024
