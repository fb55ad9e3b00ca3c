"""Config-5 at its SPECIFIED scale: 256 sequences x K=16384 x T=65536.

VERDICT r3 item 1: the round-3 artifact measured batch 8 (638 s); the
BASELINE.json spec says 256 sequences.  This driver:

* ``--probe``: measures the batch-scaling curve (batch 8/16/32) at a
  reduced T (default 16384 — the per-step rate is T-proportional, so the
  curve picks the optimal batch without burning hours), reporting
  seconds/sequence extrapolated to T=65536.
* ``--full N``: decodes all 256 sequences in batches of N through
  ``flash_decode_long_batched`` (host-phased bounded dispatches — the
  axon tunnel kills ~2 min dispatches, results/ROUND3.md), logging
  per-batch wall + every sequence's f64 path score.

Validation (the round-3 bit-level witness, promoted to the gate):
* every path f64-rescored — finite == valid transitions everywhere;
* sampled sequences re-decoded through the PER-SEQUENCE pipeline
  (different dispatch grouping, different walk batching): f64 scores
  must be BIT-IDENTICAL (three independent pipelines agreed bitwise at
  batch 8 in round 3);
* one cross-segmentation check (num_segments=2 vs 4) within the
  calibrated f64 tolerance (secondary, see oracle/validate.py).

Run:  nohup python scripts/config5_full.py --full 16 > results/config5_full.log 2>&1 &
(one TPU process at a time)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from flash_viterbi_tpu.algorithms.longform import (flash_decode_long,
                                                   flash_decode_long_batched)
from flash_viterbi_tpu.models.generate import make_sparse_hmm
from flash_viterbi_tpu.oracle.validate import (
    dp_divergence_tolerance_f64,
    log_path_score_f64,
)

K, M, T_SPEC, N_SEQS = 16384, 50, 65536, 256
PROB, SEED = 0.112, 1
N_SEGMENTS = 4


def emit(**kw):
    print(json.dumps(kw), flush=True)


def tables():
    t0 = time.time()
    hmm, y0 = make_sparse_hmm(K=K, M=M, T=T_SPEC, prob=PROB, seed=SEED)
    lh = hmm.log()
    emit(generated=f"K={K} T={T_SPEC}", wall_s=round(time.time() - t0, 1))
    return lh, np.asarray(y0, np.int32)


def make_ys(y0, n):
    rng = np.random.RandomState(7)
    return np.stack([y0] + [rng.randint(0, M, size=T_SPEC).astype(np.int32)
                            for _ in range(n - 1)])


def group_for(batch):
    """Dispatch group sizing: the phase-B replay holds one group's
    (group, batch, K) f32 deltas — keep that ~2 GB regardless of batch."""
    return max(1024, min(4096, int(2 * 1024**3 // (batch * K * 4)) // 512 * 512))


def probe(lh, y0, batches, probe_T):
    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi = jnp.asarray(lh.logPi)
    for bs in batches:
        ys = make_ys(y0, bs)[:, :probe_T]
        g = group_for(bs)
        t0 = time.time()
        paths = flash_decode_long_batched(logA, logB, logPi, ys,
                                          num_segments=N_SEGMENTS,
                                          group_steps=g)
        wall = time.time() - t0
        per_seq = wall / bs
        emit(probe_batch=bs, probe_T=probe_T, group_steps=g,
             wall_s=round(wall, 1), s_per_seq=round(per_seq, 2),
             s_per_seq_at_T65536=round(per_seq * T_SPEC / probe_T, 2),
             est_total_256_h=round(per_seq * T_SPEC / probe_T * 256 / 3600, 2),
             first_states=[int(paths[b][0]) for b in range(min(bs, 4))])


SCORES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results", "config5_scores.jsonl")


def _recorded(segments):
    """seq -> (score, wall_share) already decoded by a prior (resumed) run
    with the SAME segment count."""
    done = {}
    if os.path.exists(SCORES):
        with open(SCORES) as f:
            for line in f:
                r = json.loads(line)
                if r.get("segments") == segments:
                    for b, sc in zip(range(r["b0"], r["b1"]), r["scores"]):
                        done[b] = (sc, r["wall_s"] / (r["b1"] - r["b0"]))
    return done


def full(lh, y0, batch, limit=N_SEQS, segments=N_SEGMENTS):
    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi = jnp.asarray(lh.logPi)
    ys = make_ys(y0, limit)
    g = group_for(batch)
    done = _recorded(segments)
    emit(full_start=limit, batch=batch, group_steps=g, segments=segments,
         resumed_seqs=len(done))
    scores = np.zeros(limit)
    walls = np.zeros(limit)  # per-seq wall share (resumable accounting)
    total0 = time.time()
    sample_paths = {}
    for b0 in range(0, limit, batch):
        b1 = min(b0 + batch, limit)
        if all(b in done for b in range(b0, b1)):
            for b in range(b0, b1):
                scores[b], walls[b] = done[b]
            continue
        t0 = time.time()
        paths = flash_decode_long_batched(logA, logB, logPi, ys[b0:b1],
                                          num_segments=segments,
                                          group_steps=g)
        wall = time.time() - t0
        for b in range(b0, b1):
            scores[b] = log_path_score_f64(lh.logA, lh.logB, lh.logPi,
                                           ys[b], paths[b - b0])
            walls[b] = wall / (b1 - b0)
        if b0 == 0:
            sample_paths[0] = paths[0].copy()
        with open(SCORES, "a") as f:
            f.write(json.dumps({"b0": b0, "b1": b1, "segments": segments,
                                "batch": batch, "wall_s": round(wall, 2),
                                "scores": [float(x) for x in
                                           scores[b0:b1]]}) + "\n")
        emit(batch_done=[b0, b1], wall_s=round(wall, 1),
             s_per_seq=round(wall / (b1 - b0), 2),
             scores_finite=bool(np.isfinite(scores[b0:b1]).all()),
             elapsed_h=round((time.time() - total0) / 3600, 3))
    total = float(walls.sum())  # decode seconds across (possibly) resumed runs
    upd = float(limit) * (T_SPEC - 1) * K * K
    emit(config=f"{limit}xK{K}xT{T_SPEC}", total_wall_s=round(total, 1),
         decode_updates_per_s=upd / total,
         all_finite=bool(np.isfinite(scores).all()),
         score_min=float(scores.min()), score_max=float(scores.max()))

    ok = bool(np.isfinite(scores).all())

    # gate 1 (PRIMARY): cross-pipeline f64 bit-identity on sampled seqs —
    # per-sequence pipeline (different grouping/walk batching) must score
    # bit-identically (the round-3 witness, promoted per VERDICT item 7)
    for b in (0, limit // 2, limit - 1):
        t0 = time.time()
        alt = flash_decode_long(logA, logB, logPi, ys[b],
                                num_segments=segments, group_steps=4096)
        s_alt = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys[b], alt)
        bit = bool(s_alt == scores[b])
        path_bit = (bool((alt == sample_paths[0]).all())
                    if b == 0 and 0 in sample_paths else None)
        emit(gate="cross_pipeline_f64_bit_identity", seq=b,
             score_batched=scores[b], score_per_seq=s_alt, bit_equal=bit,
             path_bit_equal=path_bit,
             wall_s=round(time.time() - t0, 1))
        ok = ok and bit
        if path_bit is not None:
            ok = ok and path_bit

    # gate 2 (secondary): cross-segmentation tolerance
    t0 = time.time()
    alt2 = flash_decode_long(logA, logB, logPi, ys[0], num_segments=2,
                             group_steps=4096)
    s2 = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys[0], alt2)
    tol = dp_divergence_tolerance_f64(T_SPEC, scores[0])
    emit(gate="cross_segmentation_N2", gap=abs(s2 - scores[0]), tol=tol,
         wall_s=round(time.time() - t0, 1))
    ok = ok and bool(np.isfinite(s2) and abs(s2 - scores[0]) <= tol)

    print("CONFIG5-FULL OK" if ok else "CONFIG5-FULL VALIDATION FAILED",
          flush=True)
    return 0 if ok else 2


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--probe-T", type=int, default=16384)
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--full", type=int, default=0, metavar="BATCH")
    ap.add_argument("--limit", type=int, default=N_SEQS)
    ap.add_argument("--segments", type=int, default=N_SEGMENTS)
    a = ap.parse_args()
    print(jax.devices(), flush=True)
    lh, y0 = tables()
    if a.probe:
        probe(lh, y0, [int(x) for x in a.batches.split(",")], a.probe_T)
    if a.full:
        sys.exit(full(lh, y0, a.full, a.limit, segments=a.segments))
