"""Config-5-shaped end-to-end run on ONE chip (VERDICT items r1-1 / r2-4).

batch 8 x K=16384 x T=65536 through ``algorithms.longform`` — FLASH
pointer mode as host-phased bounded dispatches.  A single-dispatch decode
of this shape is IMPOSSIBLE on this environment: the axon tunnel enforces
a per-dispatch execution ceiling (~2 min device time; a benign 600-chunk
fused scan at K=16384 reproducibly crashes the worker — isolated
2026-08-19, results/ROUND3.md), and one config-5 sequence costs ~85 s
phase 1 + ~40 s phase 2, so the batch must flow as ~tens of bounded
dispatches.  ``flash_decode_long`` is bit-identical to
``flash.flash_decode(mode="pointer")`` (tests/test_longform.py — the
dispatch split happens at scan carry boundaries, the same computation).

Validation (all dispatch-bounded):
* cross-segmentation: sequence 0 re-decoded with num_segments=2 — a
  different anchor set and different phase-2 restarts; both paths are
  f64-rescored and must agree within ``dp_divergence_tolerance_f64``
  (hardware-calibrated: fp32 DP rounding drifts legitimate decoders'
  f64 scores ~4x eps*|s|*sqrt(T) apart at T=65536, MONOTONE in restart
  count — more restarts round less; the reference C behaves identically
  across MAX_THREADS, docs/DESIGN.md §1);
* every decoded path is f64-rescored: finite score == no zero-probability
  transition anywhere in 65536 steps.

Run:  nohup python scripts/config5_run.py > results/config5.log 2>&1 &
(one TPU process at a time; ~10 min with the batched pipeline)
"""

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

K, M, T, BATCH = 16384, 50, 65536, 8
PROB, SEED = 0.112, 1
N_SEGMENTS = 4
GROUP = 4096  # trellis steps per dispatch (~5.4 s at this K — safe)


def main():
    print(jax.devices(), flush=True)
    t0 = time.time()
    hmm, y0 = make_sparse_hmm(K=K, M=M, T=T, prob=PROB, seed=SEED)
    lh = hmm.log()
    print(f"generated K={K} T={T} in {time.time()-t0:.1f}s", flush=True)

    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi = jnp.asarray(lh.logPi)
    rng = np.random.RandomState(7)
    ys_np = np.stack([np.asarray(y0, np.int32)]
                     + [rng.randint(0, M, size=T).astype(np.int32)
                        for _ in range(BATCH - 1)])

    # batched pipeline: ONE logA stream serves all 8 sequences' phase 1
    # (checkpoint + backward recompute walk), lane-batched phase 2 —
    # bit-identical to per-sequence decodes (tests/test_longform.py)
    t0 = time.time()
    paths = flash_decode_long_batched(logA, logB, logPi, ys_np,
                                      num_segments=N_SEGMENTS,
                                      group_steps=GROUP)
    wall = time.time() - t0
    print(json.dumps({"batched_wall_s": round(wall, 1)}), flush=True)
    updates = 2.0 * BATCH * (T - 1) * K * K  # phase 1 + phase 2 both run
    eff_updates = 1.0 * BATCH * (T - 1) * K * K
    print(json.dumps({
        "config": f"batch{BATCH}xK{K}xT{T}",
        "wall_s": wall,
        "kernel_updates_per_s": updates / wall,
        "decode_updates_per_s": eff_updates / wall,
        "dispatch_group_steps": GROUP,
    }), flush=True)

    # validation 1: f64 rescore of every path (finite == valid everywhere)
    ok = True
    scores = []
    for b in range(BATCH):
        s = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys_np[b],
                               paths[b])
        scores.append(s)
        if not np.isfinite(s):
            ok = False
        print(json.dumps({"validate_seq": b, "score_f64": s,
                          "finite": bool(np.isfinite(s))}), flush=True)

    # validation 2: cross-segmentation agreement on sequence 0
    t0 = time.time()
    alt = flash_decode_long(logA, logB, logPi, ys_np[0], num_segments=2,
                            group_steps=GROUP)
    s_alt = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys_np[0], alt)
    tol = dp_divergence_tolerance_f64(T, scores[0])
    gap = abs(s_alt - scores[0])
    print(json.dumps({"validate": "cross_segmentation_N2",
                      "score_N4": scores[0], "score_N2": s_alt,
                      "gap": gap, "tol": tol,
                      "path_bit_equal": bool((alt == paths[0]).all()),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    if not (np.isfinite(s_alt) and gap <= tol):
        ok = False

    print("CONFIG5 OK" if ok else "CONFIG5 VALIDATION FAILED", flush=True)
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
