"""Round-3 measurement queue for the one real TPU chip, quick wins first.

Each step appends one JSON line to stdout immediately (partial progress
survives a tunnel outage).  Run exactly one TPU process at a time:

    nohup python scripts/round3_measure.py > results/round3_measure.log 2>&1 &

Round-3 context (VERDICT round-2): 9 of these steps never produced a
number in round 2 — they all died on the backtrack/beam kernels' Mosaic
lowering bugs, fixed this round.  The harness now also falls back to the
XLA path (with a ``pallas_fallback`` marker) on any kernel failure, so
every step emits a row no matter what.  Run ORDER (tpu_watch.sh): the
pytest TPU tier goes FIRST — it isolates kernel bugs in minutes.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def step(name, fn):
    # CLI step filter: `python scripts/round3_measure.py stepA stepB` re-runs
    # just those steps (for post-fix re-measurement without the full queue)
    sel = sys.argv[1:]
    if sel and name not in sel:
        return
    t0 = time.time()
    try:
        out = fn()
        emit(step=name, ok=True, elapsed_s=round(time.time() - t0, 1), **out)
    except Exception as e:  # keep the queue draining past one bad step
        traceback.print_exc()
        emit(step=name, ok=False, error=f"{type(e).__name__}: {e}")


def harness_row(**kw):
    from flash_viterbi_tpu.bench.harness import RunConfig, run_one

    row = run_one(RunConfig(**kw))
    return {k: row[k] for k in ("algorithm", "K_STATE", "obserRouteLEN",
                                "time", "updates_per_s", "parity", "memory",
                                "pallas_fallback")}


def main():
    import jax

    emit(step="devices", devices=str(jax.devices()))

    step("flash_headline", lambda: harness_row(
        algorithm="flash", K=3965, M=50, T=256, prob=0.112, seed=1))
    step("flash_lean", lambda: harness_row(
        algorithm="flash", K=3965, M=50, T=256, prob=0.112, seed=1,
        extra={"mode": "lean"}))
    # the reference's second published density (src/run.py:8-25)
    step("flash_prob169", lambda: harness_row(
        algorithm="flash", K=3965, M=50, T=256, prob=0.169, seed=1))
    # SCALE.md refresh rows (same configs as the round-1 table)
    step("fused_headline", lambda: harness_row(
        algorithm="fused", K=3965, M=50, T=256, prob=0.112, seed=1))
    step("checkpoint_K1024_T4096", lambda: harness_row(
        algorithm="checkpoint", K=1024, M=50, T=4096, prob=0.112, seed=1))
    step("fused_K1024_T4096", lambda: harness_row(
        algorithm="fused", K=1024, M=50, T=4096, prob=0.112, seed=1))
    step("fused_K16384_T256", lambda: harness_row(
        algorithm="fused", K=16384, M=50, T=256, prob=0.112, seed=1,
        check_parity=False))
    step("flash_bs_kernel", lambda: harness_row(
        algorithm="flash_bs", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=64, extra={"use_pallas": True}))
    step("flash_bs_xla", lambda: harness_row(
        algorithm="flash_bs", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=64, extra={"use_pallas": False}))
    step("sieve_bs_mp_headline", lambda: harness_row(
        algorithm="sieve_bs_mp", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=64))
    # hardware rows for the round-2 decoders (none measured on chip yet)
    step("auto_headline", lambda: harness_row(
        algorithm="auto", K=3965, M=50, T=256, prob=0.112, seed=1))
    step("sieve_bs_K512", lambda: harness_row(
        algorithm="sieve_bs", K=512, M=16, T=128, prob=0.05, seed=2,
        beam_width=32))
    # the paper's own SIEVE-BS config (run.py beam=32): host-driven
    # recursion at headline K — parity = mirror-free invariants here; the
    # heavyweight one-time witnesses (compiled C binary + fp32 mirror at
    # this exact config) live in scripts/sieve_bs_witness.py
    step("sieve_bs_headline", lambda: harness_row(
        algorithm="sieve_bs", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=32))
    step("sieve_dynamic_K512", lambda: harness_row(
        algorithm="sieve", K=512, M=16, T=128, prob=0.05, seed=2))

    def sieve_batch_lanes():
        """Batch-aware lane scheduler vs per-sequence decode on the real
        tunnel (host-driven recursion; the ~25 ms dispatch floor is the
        cost being amortized — SIEVE's chain trees only parallelize
        across the batch)."""
        import time as _t

        from flash_viterbi_tpu import decode
        from flash_viterbi_tpu.models.generate import make_sparse_hmm
        from flash_viterbi_tpu.parallel.batch import decode_batch

        K, M, T, BATCH = 512, 16, 128, 8
        hmm, y0 = make_sparse_hmm(K=K, M=M, T=T, prob=0.05, seed=2)
        rng = np.random.RandomState(3)
        ys = np.stack([np.asarray(y0, np.int32)]
                      + [rng.randint(0, M, T).astype(np.int32)
                         for _ in range(BATCH - 1)])
        rb = decode_batch(hmm, ys, algorithm="sieve", warmup=True)
        t0 = _t.time()
        per = [decode(hmm, ys[b], algorithm="sieve", warmup=False).path
               for b in range(BATCH)]
        per_wall = _t.time() - t0
        match = all((np.asarray(rb.path[b]) == np.asarray(per[b])).all()
                    for b in range(BATCH))
        return {"batch": BATCH, "batched_wall_s": round(rb.time_s, 3),
                "per_seq_wall_s": round(per_wall, 3),
                "speedup": round(per_wall / max(rb.time_s, 1e-9), 2),
                "bit_equal": bool(match)}

    step("sieve_batch_lanes_K512", sieve_batch_lanes)
    step("sieve_dag_K256", lambda: harness_row(
        algorithm="sieve_dag", K=256, M=16, T=64, prob=0.9, seed=2, dag=True))

    def sharded_vs_fused():
        import jax.numpy as jnp

        from flash_viterbi_tpu.algorithms.checkpoint import checkpoint_decode_pallas
        from flash_viterbi_tpu.algorithms.flash import flash_decode
        from flash_viterbi_tpu.models.generate import make_sparse_hmm
        from flash_viterbi_tpu.parallel.sharded import flash_decode_sharded, make_mesh

        K, M, T = 16384, 50, 4096
        hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=0.112, seed=1)
        lh = hmm.log()
        logA = jnp.asarray(lh.logA)
        logB = jnp.asarray(lh.logB)
        logPi = jnp.asarray(lh.logPi)
        ys = jnp.asarray(np.asarray(y, np.int32)[None])
        mesh = make_mesh(1, 1, 1)

        def run_shard():
            out = flash_decode_sharded(mesh, logA, logB, logPi, ys,
                                       num_segments=4, pipeline=True)
            int(np.asarray(out[:, :4]).sum())  # real sync
            return out

        out = run_shard()  # compile
        t0 = time.time(); out = run_shard(); wall_sh = time.time() - t0

        def run_ckpt():
            p = checkpoint_decode_pallas(logA, logB, logPi, jnp.asarray(y, jnp.int32))
            int(np.asarray(p[:4]).sum())
            return p

        ref = run_ckpt()
        t0 = time.time(); ref = run_ckpt(); wall_ck = time.time() - t0
        # bit-compare vs the single-chip flash (same algorithm, same
        # segment count) — vs checkpoint only f64 path scores can be
        # compared (FLASH's per-segment anchor restart rounds fp32
        # differently and legitimately flips exact-tie argmaxes; the
        # reference C FLASH behaves identically, verified at K=512/T=2048)
        single = np.asarray(flash_decode(logA, logB, logPi,
                                         jnp.asarray(np.asarray(y, np.int32)),
                                         num_segments=4, mode="pointer"))
        bitmatch = bool((np.asarray(out[0]) == single).all())
        from flash_viterbi_tpu.oracle.validate import log_path_score_f64
        yv = np.asarray(y, np.int32)
        gap = abs(log_path_score_f64(lh.logA, lh.logB, lh.logPi, yv,
                                     np.asarray(out[0]))
                  - log_path_score_f64(lh.logA, lh.logB, lh.logPi, yv,
                                       np.asarray(ref)))
        upd = 1.0 * (T - 1) * K * K
        return {"config": f"K{K}xT{T}", "sharded_wall_s": round(wall_sh, 3),
                "checkpoint_wall_s": round(wall_ck, 3),
                "sharded_upd_per_s": upd * 2 / wall_sh,  # both phases execute
                "ratio_vs_checkpoint": round(wall_sh / wall_ck, 3),
                "bit_match_vs_single_chip_flash": bitmatch,
                "score_gap_vs_checkpoint_f64": gap}

    step("sharded_111_K16384_T4096", sharded_vs_fused)

    def batched_fused(batch):
        """Aggregate throughput of the N-lane batched kernel at the
        headline config (round-1: 449 G upd/s at batch 8 — push further)."""
        import jax
        import jax.numpy as jnp

        from flash_viterbi_tpu.algorithms.fused import fused_decode_batch
        from flash_viterbi_tpu.models.generate import make_sparse_hmm
        from flash_viterbi_tpu.oracle import native as oracle

        K, M, T = 3965, 50, 256
        hmm, y0 = make_sparse_hmm(K=K, M=M, T=T, prob=0.112, seed=1)
        lh = hmm.log().padded(128)
        rng = np.random.RandomState(11)
        ys_np = np.stack([np.asarray(y0, np.int32)]
                         + [rng.randint(0, M, size=T).astype(np.int32)
                            for _ in range(batch - 1)])
        fn = jax.jit(fused_decode_batch)
        args = (jnp.asarray(lh.logA), jnp.asarray(lh.logB),
                jnp.asarray(lh.logPi), jnp.asarray(ys_np))
        out = fn(*args)
        int(np.asarray(out[:, :4]).sum())  # compile + real sync
        walls = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            int(np.asarray(out[:, :4]).sum())
            walls.append(time.time() - t0)
        wall = min(walls)
        want = oracle.vanilla(hmm.A, hmm.B, hmm.Pi, y0)
        parity = bool((np.asarray(out[0])[:T] == want).all())
        return {"batch": batch, "wall_s": round(wall, 4),
                "agg_updates_per_s": batch * (T - 1.0) * K * K / wall,
                "parity_seq0": parity}

    step("batched_fused_b16", lambda: batched_fused(16))
    step("batched_fused_b32", lambda: batched_fused(32))

    def fused_longT_backtrack():
        """Explain the round-1 57 G long-T anomaly: split the one-call fused
        decode at K=1024, T=65536 into forward scan vs backtrack, and time
        the XLA reverse scan against the new chunk-streamed Pallas walk."""
        import jax
        import jax.numpy as jnp

        from flash_viterbi_tpu.models.generate import make_sparse_hmm
        from flash_viterbi_tpu.ops import maxplus as mp
        from flash_viterbi_tpu.ops.pallas.backtrack import backtrack_pallas
        from flash_viterbi_tpu.ops.pallas.maxplus import forward_scan_pallas

        K, T = 1024, 65536
        hmm, y = make_sparse_hmm(K=K, M=50, T=T, prob=0.112, seed=1)
        lh = hmm.log()
        logA = jnp.asarray(lh.logA)
        emits = jnp.asarray(lh.logB)[:, jnp.asarray(np.asarray(y, np.int32))].T
        delta0 = jnp.asarray(lh.logPi) + emits[0]

        fwd = jax.jit(forward_scan_pallas)
        bt_xla = jax.jit(mp.backtrack)
        bt_pl = jax.jit(backtrack_pallas)

        def timed(fn, *a):
            out = fn(*a)          # compile + warm
            jax.tree.map(lambda x: x.block_until_ready(), out)
            walls = []
            for _ in range(3):
                t0 = time.time()
                out = fn(*a)
                # scalar readback = real sync through the tunnel
                leaf = jax.tree.leaves(out)[-1]
                int(np.asarray(leaf.ravel()[:1])[0])
                walls.append(time.time() - t0)
            return out, min(walls)

        (dfin, ptrs), w_fwd = timed(fwd, delta0, logA, emits[1:])
        last = mp.argmax_final(dfin)
        p_xla, w_xla = timed(bt_xla, ptrs, last)
        p_pl, w_pl = timed(bt_pl, ptrs, last)
        match = bool((np.asarray(p_xla) == np.asarray(p_pl)).all())
        return {"config": f"K{K}xT{T}", "forward_s": round(w_fwd, 4),
                "backtrack_xla_s": round(w_xla, 4),
                "backtrack_pallas_s": round(w_pl, 4),
                "fused_upd_per_s": (T - 1.0) * K * K / (w_fwd + w_pl),
                "paths_match": match}

    step("fused_longT_backtrack", fused_longT_backtrack)

    def fused_longT_e2e():
        """End-to-end fused decode at K=1024, T=65536 — the resident
        recompute pipeline (655 G measured when added, vs 289 G stored)."""
        import jax
        import jax.numpy as jnp

        from flash_viterbi_tpu.algorithms.checkpoint import checkpoint_decode_pallas
        from flash_viterbi_tpu.algorithms.fused import fused_decode
        from flash_viterbi_tpu.models.generate import make_sparse_hmm
        from flash_viterbi_tpu.oracle.validate import log_path_score_f64

        K, M, T = 1024, 50, 65536
        hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=0.112, seed=1)
        lh = hmm.log()
        logA = jnp.asarray(lh.logA)
        logB = jnp.asarray(lh.logB)
        logPi = jnp.asarray(lh.logPi)
        yd = jnp.asarray(np.asarray(y, np.int32))
        fn = jax.jit(fused_decode)
        p = fn(logA, logB, logPi, yd)
        int(np.asarray(p[:4]).sum())
        walls = []
        for _ in range(3):
            t0 = time.time()
            p = fn(logA, logB, logPi, yd)
            int(np.asarray(p[:4]).sum())
            walls.append(time.time() - t0)
        wall = min(walls)
        ck = np.asarray(checkpoint_decode_pallas(logA, logB, logPi, yd))
        s1 = log_path_score_f64(lh.logA, lh.logB, lh.logPi,
                                np.asarray(y), np.asarray(p))
        s2 = log_path_score_f64(lh.logA, lh.logB, lh.logPi,
                                np.asarray(y), ck)
        return {"config": f"K{K}xT{T}", "wall_s": round(wall, 4),
                "upd_per_s": (T - 1.0) * K * K / wall,
                "bit_equal_vs_checkpoint": bool((np.asarray(p) == ck).all()),
                "score_gap_f64": abs(s1 - s2)}

    step("fused_longT_e2e", fused_longT_e2e)
    emit(step="DONE")


if __name__ == "__main__":
    main()
