"""Scaling model + measurement for the (data, seq, state) mesh.

The BASELINE target is >= 80% scaling efficiency to >= 2 hosts at
K=16384, T=65536, 256 sequences.  Only one physical chip is attached in
this environment, so this module provides

(a) an *honest analytic model* of the pipelined sharded decode
    (``parallel.sharded``): per-device trellis-update counts including the
    pipeline fill bubble, per-device memory (segment pointer tables, plane
    stores), and exact byte counts of every collective the decode issues —
    the model describes the implementation as built, not an idealized
    algorithm; and
(b) measured *work counters* over the virtual-device CPU mesh
    (``work_report``): the per-device update counts derive from the same
    static plan the decode traces, so the tests can pin the model to the
    code path; plus a parity sweep (``measure_virtual``) asserting
    bit-identical paths across mesh shapes.

Calibration: ``CHIP_UPDATES_PER_S`` is the *measured* fused-kernel rate
from the round-1 hardware bench (BENCH_r01: 185-224 G upd/s on TPU v5e at
the K=3965/T=256 headline config; 189 G sustained for the fused decode) —
not a datasheet constant.  ``ICI_BYTES_PER_S`` is the v5e per-link
bandwidth class.

Model summary (see ``analyze`` for the formulas):

* phase 1 is a pipeline over ``n_seq`` equal time blocks; with ``n_mb``
  microbatches in flight the bubble multiplies phase-1 device work by
  ``(n_mb + n_seq - 1) / n_mb`` — for a single sequence this term honestly
  reports the serial chain (no pretend speedup), for the 256-sequence
  config-5 batch it is a few percent.
* phase 2 is embarrassingly parallel over (data, seq) and state-sharded.
* state axis: 2 tiled all_gathers (delta fp32 + ptr int32) per trellis
  step in both phases; ``8*K*(t-1)/t`` bytes per step per device.
* seq axis: one (mb, K) fp32 ppermute per pipeline tick, the (n_seq, Bd,
  K) boundary-plane gather, and the final (Bd, T) int32 psum.

Validation (round 4): ``parallel.commtrace`` walks the sharded decode's
jaxpr on virtual meshes and counts every collective it actually issues
(scan trips multiplied through).  The ppermute term (whose tick count IS
the pipeline bubble) and the path-psum term match the trace EXACTLY, and
the total per-device received bytes match within 15% across (2,2,2) /
(1,4,2) / (2,1,4) — pinned in tests/test_commtrace.py.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# Measured on hardware (BENCH_r01.json / results/SCALE.md): sustained fused
# Pallas kernel decode rate on one TPU v5e chip at the headline config.
CHIP_UPDATES_PER_S = 1.89e11
# v5e ICI per-direction link bandwidth class (public spec order of magnitude).
ICI_BYTES_PER_S = 4.5e10


@dataclasses.dataclass
class ScalingReport:
    n_data: int
    n_seq: int
    n_state: int
    K: int
    T: int
    batch: int
    microbatch: int
    num_segments: int
    # per-device accounting
    updates_per_device: float          # trellis updates (phase 1 + 2 + bubble)
    ideal_updates_per_device: float    # 2*B*T*K^2 / n_devices
    ici_bytes_per_device: float
    ptr_bytes_per_device: int          # phase-2 pointer tables (peak)
    plane_bytes_per_device: int        # phase-1 plane store
    # derived
    compute_s: float
    comm_s: float
    modeled_wall_s: float
    modeled_efficiency: float          # ideal_time(n devices) / modeled wall

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def analyze(mesh_shape: tuple[int, int, int], K: int, T: int, batch: int,
            microbatch: int = 1, num_segments: int | None = None,
            chip_updates_per_s: float = CHIP_UPDATES_PER_S,
            ici_bytes_per_s: float = ICI_BYTES_PER_S) -> ScalingReport:
    """Honest per-device model of one pipelined sharded decode."""
    d, s, t = mesh_shape
    B, mb = batch, microbatch
    if B % d:
        raise ValueError("data axis size must divide the batch")
    Bd = B // d
    mb = min(mb, Bd)
    if Bd % mb:
        # mirror the implementation (sharded._flash_decode_pipelined): a
        # non-dividing microbatch is not a runnable config, so modeling it
        # would silently drop Bd % mb sequences from the accounting
        raise ValueError(
            f"microbatch {mb} must divide the per-data-shard batch {Bd}")
    n_mb = Bd // mb
    if num_segments is None:
        num_segments = 4 * s
    L = T // s

    # --- per-device update counts (what the implementation actually runs) ---
    # phase 1: every device computes (n_mb + s - 1) ticks of mb*L steps of
    # K*K/t updates (invalid pipeline ticks still execute — static shapes).
    ticks = n_mb + s - 1
    spd = max(1, num_segments // s)
    upd_p1 = ticks * mb * max(L - 1, 1) * K * (K / t)
    # phase 2: Bd sequences x spd segments x (Lseg-1) steps, state-sharded
    upd_p2 = Bd * max(L - spd, 1) * K * (K / t)
    updates = upd_p1 + upd_p2
    # ideal = the same two passes' step counts with zero bubble/imbalance
    ideal = B * K * K * ((T - 1) + max(T - num_segments, 1)) / (d * s * t)

    # --- per-device ICI bytes ---
    # state axis: delta fp32 + ptr int32 all_gather per step, both phases,
    # plus the boundary gathers the round-4 model missed (attributed via
    # the jaxpr trace, round 5): phase 1 adds 2 fp32 + 1 int32 (mb, K)
    # gathers per pipeline tick (delta0 init + final-boundary delta +
    # boundary ptr), phase 2 adds 2 fp32 per decoded (sequence, segment)
    # lane (init + final-argmax delta).  Phase 2 runs L - spd real steps
    # per sequence (the round-4 formula said L - 1 — an overcount that
    # partially hid the missing boundary terms inside the old 15% slack).
    frac_t = (t - 1) / t if t > 1 else 0.0
    steps_p1 = ticks * mb * max(L - 1, 1)
    steps_p2 = Bd * max(L - spd, 1)
    rows_state = (2 * (steps_p1 + steps_p2)      # per-step delta + ptr
                  + 3 * mb * ticks               # phase-1 tick boundaries
                  + 2 * Bd * spd)                # phase-2 lane boundaries
    bytes_state = rows_state * K * 4 * frac_t
    # seq axis: (mb, K) fp32 ppermute per tick; (s, Bd, K) plane + final
    # gathers; (Bd, T) int32 psum (log2 s stages, bidirectional halving)
    bytes_seq = 0.0
    if s > 1:
        bytes_seq += ticks * mb * K * 4                  # delta hops
        bytes_seq += (s - 1) * Bd * K * 4                # beta plane gather
        # finals: argmaxed locally before the gather (sharded.py), so the
        # collective ships (n_mb, mb) int32 per device, not (.., K) fp32
        bytes_seq += (s - 1) * Bd * 4
        bytes_seq += math.ceil(math.log2(s)) * Bd * T * 4  # path psum
    ici_bytes = bytes_state + bytes_seq

    # --- per-device memory (the terms that gate config-5 shapes) ---
    Lseg = max(1, L // spd)
    ptr_bytes = mb * spd * max(Lseg - 1, 1) * K * 4      # phase-2 pointer table
    plane_bytes = ticks * mb * spd * K * 4               # stacked plane store

    compute_s = updates / chip_updates_per_s
    comm_s = ici_bytes / ici_bytes_per_s
    wall = compute_s + comm_s
    ideal_wall = ideal / chip_updates_per_s
    return ScalingReport(
        n_data=d, n_seq=s, n_state=t, K=K, T=T, batch=B, microbatch=mb,
        num_segments=num_segments,
        updates_per_device=updates, ideal_updates_per_device=ideal,
        ici_bytes_per_device=ici_bytes,
        ptr_bytes_per_device=int(ptr_bytes),
        plane_bytes_per_device=int(plane_bytes),
        compute_s=compute_s, comm_s=comm_s, modeled_wall_s=wall,
        modeled_efficiency=ideal_wall / wall if wall else 0.0,
    )


def work_report(mesh_shape: tuple[int, int, int], K: int, T: int, batch: int,
                microbatch: int = 1, num_segments: int | None = None) -> dict:
    """Per-device work counters of the pipelined plan (no wall clocks):
    update counts, collective bytes, and memory — the load-bearing numbers
    the efficiency claim rests on."""
    rep = analyze(mesh_shape, K, T, batch, microbatch, num_segments)
    return {
        "mesh": dict(zip(("data", "seq", "state"), mesh_shape)),
        "updates_per_device": rep.updates_per_device,
        "ideal_updates_per_device": rep.ideal_updates_per_device,
        "work_balance": rep.ideal_updates_per_device / rep.updates_per_device,
        "ici_bytes_per_device": rep.ici_bytes_per_device,
        "ptr_bytes_per_device": rep.ptr_bytes_per_device,
        "plane_bytes_per_device": rep.plane_bytes_per_device,
        "modeled_efficiency": rep.modeled_efficiency,
    }


def single_chip_wall_model(K: int, T: int,
                           chip_updates_per_s: float = CHIP_UPDATES_PER_S
                           ) -> float:
    """Modeled single-chip fused decode wall (seconds) — the calibration
    anchor: must reproduce the measured SCALE.md rows within ~20%."""
    return (T - 1) * K * K / chip_updates_per_s


def measure_virtual(mesh_shapes, K: int = 64, M: int = 8, T: int = 64,
                    prob: float = 0.3, batch: int = 8, seed: int = 7):
    """Run the sharded decode over each virtual mesh shape; returns rows of
    (shape, paths_equal, work counters).  The CPU backend's wall times are
    meaningless (dispatch-dominated), so none are reported — correctness
    (bit-identical paths across shardings) + the analytic counters are the
    artifact."""
    import jax.numpy as jnp

    from ..models.generate import make_sparse_hmm
    from .sharded import flash_decode_sharded, make_mesh

    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=prob, seed=seed)
    lh = hmm.log()
    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi = jnp.asarray(lh.logPi)
    ys = jnp.stack([jnp.asarray(y, jnp.int32)] * batch)

    # one segment count valid for EVERY shape (a multiple of each seq axis,
    # <= T//2) so every sharding decodes the same tree — passing a fixed 8
    # would let flash_decode_sharded renegotiate per shape, silently
    # diverging from the counters and from the base path on fp ties
    l = 1
    for shape in mesh_shapes:
        l = math.lcm(l, shape[1])
    segs = max(l, (min(8, T // 2) // l) * l)
    if T < 2 * segs:
        raise ValueError(f"T={T} too short for a common segment count "
                         f"(seq axes need a multiple of {l})")

    rows = []
    base = None
    for shape in mesh_shapes:
        mesh = make_mesh(*shape)
        out = np.asarray(flash_decode_sharded(mesh, logA, logB, logPi, ys,
                                              num_segments=segs))
        if base is None:
            base = out
        row = {"shape": shape, "paths_equal": bool((out == base).all())}
        row.update(work_report(shape, K, T, batch, num_segments=segs))
        rows.append(row)
    return rows
