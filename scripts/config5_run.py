"""Config-5-shaped end-to-end run on ONE chip (VERDICT round-1 item 1).

batch 8 x K=16384 x T=65536 through ``flash_decode_sharded`` on a (1,1,1)
mesh — the full sharded code path (pipelined phase 1 + chunked
fused-kernel phase 2, emissions gathered from the (M, K) table, part-wise
backtrack) at the BASELINE north-star per-chip shape.  Validation:

* bit-exact vs the single-chip ``flash_decode`` (same algorithm, same
  segment count) on sequence 0 — the sharded orchestration must not
  change a single argmax;
* f64-rescored path score vs an independent ``checkpoint`` decode on two
  sequences.  NOT a bit-compare: FLASH's phase 2 restarts each segment's
  DP from its anchor, which rounds fp32 differently from the global
  sweep and legitimately flips exact-tie argmaxes — the reference C
  FLASH does the same (verified bit-exact against the compiled binary at
  K=512, T=2048 where it differs from vanilla at 5 positions).  Both
  paths must score within accumulated-fp32-rounding distance.

Run:  nohup python scripts/config5_run.py > results/config5.log 2>&1 &
(one TPU process at a time; takes ~1 h: two full timed runs + validation)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from flash_viterbi_tpu.algorithms.checkpoint import checkpoint_decode_pallas
from flash_viterbi_tpu.models.generate import make_sparse_hmm
from flash_viterbi_tpu.parallel.sharded import flash_decode_sharded, make_mesh

K, M, T, BATCH = 16384, 50, 65536, 8
PROB, SEED = 0.112, 1
N_SEGMENTS = 4  # spd on the single chip; bounds per-segment pointer tables


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
    ys = jnp.asarray(ys_np)
    mesh = make_mesh(1, 1, 1)

    def run():
        out = flash_decode_sharded(mesh, logA, logB, logPi, ys,
                                   num_segments=N_SEGMENTS, pipeline=True)
        # scalar readback forces a real sync through the tunnel
        head = int(np.asarray(out[:, :8]).sum())
        return out, head

    t0 = time.time()
    out, _ = run()
    t_first = time.time() - t0
    print(f"run 1 (compile + execute): {t_first:.1f}s", flush=True)

    t0 = time.time()
    out, _ = run()
    wall = time.time() - t0
    updates = 2.0 * BATCH * (T - 1) * K * K  # both passes actually executed
    eff_updates = 1.0 * BATCH * (T - 1) * K * K  # decoded trellis cells
    print(json.dumps({
        "config": f"batch{BATCH}xK{K}xT{T}",
        "wall_s": wall,
        "kernel_updates_per_s": updates / wall,
        "decode_updates_per_s": eff_updates / wall,
    }), flush=True)

    # validation 1: bit-exact vs the single-chip flash (same algorithm).
    # Pointer mode holds T*K*4 = 4 GiB of pointer tables at this shape; if
    # that doesn't fit alongside the tables, fall back to lean mode (O(N*K)
    # memory, bit-identical by tests) rather than losing the measurement.
    from flash_viterbi_tpu.algorithms.flash import flash_decode

    t0 = time.time()
    single = None
    for mode in ("pointer", "lean"):
        try:
            single = np.asarray(flash_decode(logA, logB, logPi,
                                             jnp.asarray(ys_np[0]),
                                             num_segments=N_SEGMENTS,
                                             mode=mode))
            break
        except Exception as e:
            print(json.dumps({"validate": "bit_vs_single_chip_flash",
                              "mode": mode,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    bit_checked = single is not None
    if bit_checked:
        bitmatch = bool((np.asarray(out[0]) == single).all())
        print(json.dumps({"validate": "bit_vs_single_chip_flash",
                          "mode": mode, "match": bitmatch,
                          "wall_s": time.time() - t0}), flush=True)
        assert bitmatch, "sharded path diverged from single-chip flash"

    # validation 2: f64-rescored optimality vs an independent checkpoint
    # decode (path-level fp32 tie flips are legitimate — see module doc).
    # Gross-breakage guard only (one genuinely wrong transition costs
    # O(-log p) ~ 11 here, well above the tolerance); the exactness claim
    # is validation 1.
    from flash_viterbi_tpu.oracle.validate import (
        log_path_score_f64,
        score_tolerance_f64,
    )

    for b in (0, BATCH - 1):
        t0 = time.time()
        ref = np.asarray(checkpoint_decode_pallas(logA, logB, logPi,
                                                  jnp.asarray(ys_np[b])))
        got = np.asarray(out[b])
        s_got = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys_np[b], got)
        s_ref = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys_np[b], ref)
        tol = score_tolerance_f64(T, s_ref)
        valid = bool(np.isfinite(s_got))
        close = abs(s_got - s_ref) <= tol
        print(json.dumps({"validate_seq": b, "score_sharded": s_got,
                          "score_checkpoint": s_ref, "tol": tol,
                          "path_bit_equal": bool((got == ref).all()),
                          "wall_s": time.time() - t0}), flush=True)
        assert valid, f"sequence {b}: sharded path has -inf transitions"
        assert close, f"sequence {b}: score gap {abs(s_got-s_ref)} > {tol}"
    if bit_checked:
        print("CONFIG5 OK", flush=True)
    else:
        # both flash modes failed above: the measurement stands but the
        # headline bit-exactness claim was NOT validated — say so loudly
        # and exit nonzero so the queue log can't read as a full pass
        print("CONFIG5 MEASURED; BIT-VALIDATION SKIPPED (both single-chip "
              "flash modes failed — see errors above)", flush=True)
        sys.exit(2)


if __name__ == "__main__":
    main()
