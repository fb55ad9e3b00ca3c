"""One-time SIEVE-BS headline-scale correctness witness (VERDICT r2 item 5).

The bench row at K=3965/T=256/B=32 (the paper's own SIEVE-BS config,
``src/run.py:8-25``) previously reported ``parity: unchecked`` — the fp32
framework mirror is too slow for a bench *loop* above K=512.  Here both
heavyweight witnesses run ONCE, wall time be damned:

1. the reference C SIEVE-BS (``Base_line/C implementations/SIEVE-BS.c``),
   compiled against the vendored glib shim at the headline config, on the
   exact fixture the bench rows use — path bit-diff vs the device decoder,
   falling back to a quirk-scored f64 comparison on legitimate fp tie
   splits (C scores in float64, the decoder in fp32);
2. the fp32 framework mirror (``oracle.framework.sieve_bs``) — the
   decoder's own bit-exactness yardstick, extended past its bench cap.

Run:  nohup python scripts/sieve_bs_witness.py > results/sieve_bs_witness.log 2>&1 &
(one TPU process at a time; the C binary and the mirror are CPU-side)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K, M, T, PROB, SEED, BW = 3965, 50, 256, 0.112, 1, 32


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from flash_viterbi_tpu.models.generate import make_sparse_hmm
    from flash_viterbi_tpu.oracle.validate import beam_family_score_f64
    from flash_viterbi_tpu.utils.io import save_dataset
    from tests.ref_compile import build_and_run, have_gcc, have_glib

    t0 = time.time()
    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=PROB, seed=SEED)
    emit(step="fixture", K=K, T=T, prob=PROB, seed=SEED,
         elapsed_s=round(time.time() - t0, 1))

    # device decode (same decoder + config as the bench row)
    import flash_viterbi_tpu as fvt

    t0 = time.time()
    r = fvt.decode(hmm, y, algorithm="sieve_bs", beam_width=BW, warmup=True)
    dev = np.asarray(r.path)[:T]
    emit(step="device_decode", wall_s=round(r.time_s, 3),
         elapsed_s=round(time.time() - t0, 1),
         sentinels=int((dev < 0).sum()))

    s_dev, brk = beam_family_score_f64(hmm.A, hmm.B, hmm.Pi, y, dev)
    emit(step="device_score_f64", score=s_dev, junction_breaks=brk,
         finite=bool(np.isfinite(s_dev)))

    # witness 2 first (pure python, no toolchain dependency): fp32 mirror
    from flash_viterbi_tpu.oracle import framework as fw

    t0 = time.time()
    pairs = fw.sieve_bs(hmm.A, hmm.B, hmm.Pi, y, beam_width=BW)
    flat = np.asarray([pairs[0][0], pairs[0][1]] + [p[1] for p in pairs[1:]])
    mir = np.full(T, -1, np.int64)
    mir[: min(len(flat), T)] = flat[:T]
    bit = bool((dev == mir).all())
    emit(step="fp32_mirror", bit_equal=bit,
         mismatches=int((dev != mir).sum()),
         elapsed_s=round(time.time() - t0, 1))

    # witness 1: the compiled reference C binary on the same fixture.
    # KNOWN OUTCOME at this config: the reference itself SEGFAULTS —
    # beam fallout leaves a subproblem's median unrecorded and
    # ``find_int(previous_medians_a, last, 0)`` dereferences NULL after
    # printing "INT ERROR" (SIEVE-BS.c:220,568; ASan-verified 2026-08-19,
    # results/ROUND3.md).  That is exactly the case this framework's
    # sentinel totality-extension decodes instead of crashing (the Python
    # reference raises KeyError there too, sieve_beam_search.py:88).  The
    # crash is recorded as a result, not an error.
    if not (have_gcc() and have_glib()):
        emit(step="c_binary", skipped="no gcc/glib shim")
        emit(step="DONE")
        return
    try:
        with tempfile.TemporaryDirectory() as w:
            save_dataset(w, hmm, y, prob=PROB)
            t0 = time.time()
            cp = build_and_run("sieve_bs", w, K, M, T, PROB, w, beam=BW,
                               timeout=6 * 3600)
            cwall = time.time() - t0
    except Exception as e:
        emit(step="c_binary", reference_crash=True,
             detail=f"{type(e).__name__}: {e}"[:200],
             note="reference NULL-deref on unrecorded median "
                  "(SIEVE-BS.c:220 find_int type=0); framework decodes "
                  "this fixture with 3 sentinel fallouts instead")
        emit(step="DONE")
        return
    cp = cp[:T]
    n = min(len(cp), T)
    cbit = bool((dev[:n] == cp[:n]).all())
    s_c, brk_c = beam_family_score_f64(hmm.A, hmm.B, hmm.Pi, y, cp)
    emit(step="c_binary", wall_s=round(cwall, 1), bit_equal=cbit,
         mismatches=int((dev[:n] != cp[:n]).sum()),
         score_c=s_c, score_device=s_dev,
         score_gap=abs(s_c - s_dev), junction_breaks_c=brk_c,
         sentinel_masks_equal=bool(((dev[:n] < 0) == (cp[:n] < 0)).all()))

    emit(step="DONE")


if __name__ == "__main__":
    main()
