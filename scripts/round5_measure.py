"""Round-5 measurement queue for the one real TPU chip.

Same protocol as round3/round4_measure.py (one JSON line per step,
partial progress survives a tunnel outage, CLI args select steps).  Run
exactly ONE TPU process at a time (after the config-5 run finishes):

    python scripts/round5_measure.py > results/round5_measure.log 2>&1

Round-5 additions over the round-4 queue: the sieve_bs on-device-engine
headline + fixtures (ref_timings --fvt), the new-tiling K=16384 scan
rate, the flattened walk-lane rows, the beam-niche measurement, and the
SCALE.md refresh rows re-measured in THIS round's window so README/SCALE
cite one vintage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.round3_measure import emit, harness_row, step

HBM_PEAK = 819e9


def main():
    import jax

    emit(step="devices", devices=str(jax.devices()))

    # ---- SCALE.md refresh rows (same configs as rounds 1-4) --------------
    step("flash_headline", lambda: harness_row(
        algorithm="flash", K=3965, M=50, T=256, prob=0.112, seed=1))
    step("flash_prob169", lambda: harness_row(
        algorithm="flash", K=3965, M=50, T=256, prob=0.169, seed=1))
    step("fused_headline", lambda: harness_row(
        algorithm="fused", K=3965, M=50, T=256, prob=0.112, seed=1))
    step("auto_headline", lambda: harness_row(
        algorithm="auto", K=3965, M=50, T=256, prob=0.112, seed=1))
    step("checkpoint_K1024_T4096", lambda: harness_row(
        algorithm="checkpoint", K=1024, M=50, T=4096, prob=0.112, seed=1))
    step("fused_K1024_T4096", lambda: harness_row(
        algorithm="fused", K=1024, M=50, T=4096, prob=0.112, seed=1))
    step("fused_K16384_T256", lambda: harness_row(
        algorithm="fused", K=16384, M=50, T=256, prob=0.112, seed=1))
    step("flash_bs_xla", lambda: harness_row(
        algorithm="flash_bs", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=64, extra={"use_pallas": False}))
    step("flash_bs_kernel", lambda: harness_row(
        algorithm="flash_bs", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=64, extra={"use_pallas": True}))
    step("sieve_bs_mp_headline", lambda: harness_row(
        algorithm="sieve_bs_mp", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=64))
    step("sieve_bs_headline", lambda: harness_row(
        algorithm="sieve_bs", K=3965, M=50, T=256, prob=0.112, seed=1,
        beam_width=32))

    # ---- framework side of the reference-timing fixtures ----------------
    def fvt_ref_fixtures():
        from scripts.ref_timings import run_fvt

        data = run_fvt()
        return {"rows": {k: v.get("fvt_s") for k, v in data.items()}}

    step("fvt_ref_fixtures", fvt_ref_fixtures)

    # ---- walk-lane rows (flattened scaling) ------------------------------
    from scripts.round4_measure import main as _r4  # noqa: F401  (reuse fns)
    import scripts.round4_measure as r4mod

    # call round4's walk_lanes via its module-level closure pattern:
    # reimplemented here through the same harness function signature
    def walk_lanes(N, K, Tm=512):
        import functools

        import jax as _jax
        import jax.numpy as jnp

        from flash_viterbi_tpu.bench.harness import marginal_time
        from flash_viterbi_tpu.ops import maxplus as mp
        from flash_viterbi_tpu.ops.pallas.backtrack import (
            argmax_walk_pallas, argmax_walk_supported)
        from flash_viterbi_tpu.ops.pallas.maxplus import maxplus_scan_deltas

        assert argmax_walk_supported(N, K), (N, K)
        rng = np.random.default_rng(0)
        logA = jnp.asarray(rng.standard_normal((K, K)), jnp.float32)
        emits = jnp.asarray(rng.standard_normal((Tm, N, K)).astype(np.float32))
        d0 = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
        d, deltas = maxplus_scan_deltas(logA, emits, d0)
        last = jnp.argmax(d, axis=1).astype(jnp.int32)
        logAT = jnp.transpose(logA)
        got = np.asarray(argmax_walk_pallas(deltas, logAT, last))
        ok = True
        for n in (0, N // 2, N - 1):
            _, ptrs = mp.forward_scan(d0[n], logA, emits[:, n])
            want = np.asarray(mp.backtrack(ptrs, last[n]))
            ok = ok and bool((got[n] == want).all())

        @functools.partial(_jax.jit, static_argnames="k")
        def chain(deltas, last, k):
            out = None
            l2 = last
            for _ in range(k):
                out = argmax_walk_pallas(deltas, logAT, l2)
                l2 = jnp.where(out[:, 0] >= 0, last, jnp.zeros_like(last))
            return out

        per = marginal_time(lambda k: (lambda: chain(deltas, last, k=k)))
        return {"N": N, "K": K, "Tm": Tm, "wall_s": round(per, 4),
                "us_per_row": round(per / Tm * 1e6, 2), "parity_3lanes": ok}

    step("walk_lanes_N8_K4096", lambda: walk_lanes(8, 4096))
    step("walk_lanes_N32_K2048", lambda: walk_lanes(32, 2048))
    step("walk_lanes_N64_K1024", lambda: walk_lanes(64, 1024))
    step("walk_lanes_N128_K1024", lambda: walk_lanes(128, 1024))

    # ---- K=16384 scan rate with the round-5 tiling -----------------------
    def scan16384():
        import functools

        import jax as _jax
        import jax.numpy as jnp

        from flash_viterbi_tpu.bench.harness import marginal_time
        from flash_viterbi_tpu.ops.pallas.maxplus import (_pick_tiles,
                                                          maxplus_scan_deltas)

        K, N, Tm = 16384, 16, 32
        rng = np.random.default_rng(0)
        logA = jnp.asarray(rng.standard_normal((K, K)).astype(np.float32))
        emits = jnp.asarray(rng.standard_normal((Tm, N, K)).astype(np.float32))
        d0 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))

        @functools.partial(_jax.jit, static_argnames="k")
        def chain(logA, emits, d0, k):
            d = d0
            for _ in range(k):
                dfin, _ = maxplus_scan_deltas(logA, emits, d)
                d = jnp.where(dfin[:, :1] > -1e30, d0, dfin * 0)
            return d

        per = marginal_time(lambda k: (lambda: chain(logA, emits, d0, k=k)))
        per_step = per / Tm
        return {"tiles": list(_pick_tiles(K)),
                "ms_per_step": round(per_step * 1e3, 3),
                "counted_ops_per_s": 2 * N * K * K / per_step,
                "pct_vpu_peak_counted": round(
                    100 * 2 * N * K * K / per_step / 6.1e12, 1),
                "logA_stream_floor_ms": round(K * K * 4 / HBM_PEAK * 1e3, 3)}

    step("scan_deltas_K16384_N16", scan16384)

    # ---- batched fused aggregate + long-T rows (refresh) -----------------
    def batched_fused(batch):
        import jax as _jax
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
        fn = _jax.jit(fused_decode_batch)
        args = (jnp.asarray(lh.logA), jnp.asarray(lh.logB),
                jnp.asarray(lh.logPi), jnp.asarray(ys_np))
        out = fn(*args)
        int(np.asarray(out[:, :4]).sum())
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

    step("batched_fused_b64", lambda: batched_fused(64))

    def fused_longT_e2e():
        import jax as _jax
        import jax.numpy as jnp

        from flash_viterbi_tpu.algorithms.checkpoint import checkpoint_decode_pallas
        from flash_viterbi_tpu.algorithms.fused import fused_decode
        from flash_viterbi_tpu.models.generate import make_sparse_hmm

        K, M, T = 1024, 50, 65536
        hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=0.112, seed=1)
        lh = hmm.log()
        logA = jnp.asarray(lh.logA)
        logB = jnp.asarray(lh.logB)
        logPi = jnp.asarray(lh.logPi)
        yd = jnp.asarray(np.asarray(y, np.int32))
        fn = _jax.jit(fused_decode)
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
        return {"config": f"K{K}xT{T}", "wall_s": round(wall, 4),
                "upd_per_s": (T - 1.0) * K * K / wall,
                "bit_equal_vs_checkpoint": bool((np.asarray(p) == ck).all())}

    step("fused_longT_e2e", fused_longT_e2e)

    # ---- beam niche (VERDICT item 5) -------------------------------------
    def beam_niche():
        from scripts.beam_niche import main as bn

        bn()
        import json

        with open(os.path.join(os.path.dirname(__file__), os.pardir,
                               "results", "beam_niche.json")) as f:
            return {"rows": json.load(f)}

    step("beam_niche", beam_niche)
    emit(step="DONE")


if __name__ == "__main__":
    main()
