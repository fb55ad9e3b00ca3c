"""Scaling model + measurement for the (data, seq, state) mesh.

The BASELINE target is >= 80% scaling efficiency to >= 2 hosts at
K=16384, T=65536, 256 sequences.  Only one physical chip is attached in
this environment, so this module provides (a) the *analytic* communication
model — exact byte counts of every collective the sharded decode issues —
and (b) measured sweeps over the virtual-device CPU mesh (correctness +
relative overhead; the tests run these), with the same code path that runs
on a real slice.

Communication inventory per decoded sequence (see ``parallel.sharded``):

* state axis (tp): 2 tiled all_gathers per trellis step (delta fp32 +
  pointer int32), each moving K*4*(n_state-1)/n_state bytes over ICI.
  Compute per step per chip is K^2/n_state max-plus ops, so the
  comm:compute ratio is ~ 8*n_state/K — at K=16384 even n_state=8 is
  0.4% of the FLOP time: state-parallel scaling is compute-bound.
* seq axis (sp): no per-step traffic; one psum of the (T,) int32 path at
  the end (T*4 bytes, log n_seq stages).
* data axis (dp): zero cross-chip traffic.

Efficiency model (per chip bandwidth B_ici, throughput C updates/s):

    eff(n_state) = 1 / (1 + (8 * n_state / K) * (C / B_ici))

With v5e-class numbers (C ~ 2e11 upd/s sustained, B_ici ~ 4.5e10 B/s w/w)
the model gives >= 97% at K=16384 for n_state <= 8 — comfortably past the
80% bar; the dominant term at scale is phase-1's serial dependency, which
dp over the 256-sequence batch hides completely.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


@dataclasses.dataclass
class CommReport:
    n_data: int
    n_seq: int
    n_state: int
    K: int
    T: int
    batch: int
    ici_bytes_state_per_seq: int
    ici_bytes_seq_per_seq: int
    comm_compute_ratio: float
    modeled_efficiency: float

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def analyze(mesh_shape: tuple[int, int, int], K: int, T: int, batch: int,
            chip_updates_per_s: float = 2.0e11,
            ici_bytes_per_s: float = 4.5e10) -> CommReport:
    """Analytic communication/efficiency model for one sharded decode."""
    n_data, n_seq, n_state = mesh_shape
    frac = (n_state - 1) / n_state if n_state > 1 else 0.0
    per_step = int(2 * K * 4 * frac)  # delta + ptr all_gathers
    state_bytes = per_step * (T - 1) * 2  # phase 1 + phase 2 sweeps
    seq_bytes = T * 4 * max(0, n_seq - 1)
    compute_s = 2.0 * K * K * T / n_state / chip_updates_per_s
    comm_s = (state_bytes + seq_bytes) / ici_bytes_per_s
    ratio = comm_s / compute_s if compute_s else float("inf")
    return CommReport(
        n_data=n_data, n_seq=n_seq, n_state=n_state, K=K, T=T, batch=batch,
        ici_bytes_state_per_seq=state_bytes,
        ici_bytes_seq_per_seq=seq_bytes,
        comm_compute_ratio=ratio,
        modeled_efficiency=1.0 / (1.0 + ratio),
    )


def measure_virtual(mesh_shapes, K: int = 64, M: int = 8, T: int = 64,
                    prob: float = 0.3, batch: int = 8, seed: int = 7):
    """Run the sharded decode over each virtual mesh shape; returns rows of
    (shape, wall_s, paths_equal).  Wall times on the CPU backend are only
    relative sanity — the point is that the exact multi-chip program
    compiles, runs, and agrees bit-for-bit across shardings."""
    import jax.numpy as jnp

    from ..models.generate import make_sparse_hmm
    from .sharded import flash_decode_sharded, make_mesh

    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=prob, seed=seed)
    lh = hmm.log()
    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi = jnp.asarray(lh.logPi)
    ys = jnp.stack([jnp.asarray(y, jnp.int32)] * batch)

    rows = []
    base = None
    for shape in mesh_shapes:
        mesh = make_mesh(*shape)
        segs = 8  # fixed across shapes so every sharding decodes the same tree
        out = np.asarray(flash_decode_sharded(mesh, logA, logB, logPi, ys,
                                              num_segments=segs))
        t0 = time.perf_counter()
        np.asarray(flash_decode_sharded(mesh, logA, logB, logPi, ys,
                                        num_segments=segs))
        wall = time.perf_counter() - t0
        if base is None:
            base = out
        rows.append({"shape": shape, "wall_s": wall,
                     "paths_equal": bool((out == base).all())})
    return rows
