"""Pallas kernel correctness (interpreter mode on CPU): bit-exact parity
with the XLA max-plus scan, including lowest-index tie-breaking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flash_viterbi_tpu import decode
from flash_viterbi_tpu.ops import maxplus as mp
from flash_viterbi_tpu.ops.pallas.maxplus import forward_scan_pallas, maxplus_scan


def _tables(hmm):
    lh = hmm.log().padded(128)
    return jnp.asarray(lh.logA), jnp.asarray(lh.logB), jnp.asarray(lh.logPi)


def test_scan_matches_xla(small_problem):
    hmm, y = small_problem
    logA, logB, logPi = _tables(hmm)
    emits = logB[:, jnp.asarray(y, jnp.int32)].T
    d0 = logPi + emits[0]
    dref, pref = mp.forward_scan(d0, logA, emits[1:])
    dk, pk = forward_scan_pallas(d0, logA, emits[1:], interpret=True)
    np.testing.assert_array_equal(np.asarray(dref), np.asarray(dk))
    np.testing.assert_array_equal(np.asarray(pref), np.asarray(pk))


def test_scan_tie_breaking():
    """Quantized scores force exact fp32 ties; lowest source index must win."""
    rng = np.random.RandomState(0)
    K = 256
    logA = jnp.asarray(np.round(rng.randn(K, K) * 2) / 2, jnp.float32)
    emits = jnp.asarray(np.round(rng.randn(12, K)), jnp.float32)
    d0 = jnp.asarray(np.round(rng.randn(K)), jnp.float32)
    dref, pref = mp.forward_scan(d0, logA, emits)
    dk, pk = forward_scan_pallas(d0, logA, emits, interpret=True)
    np.testing.assert_array_equal(np.asarray(dref), np.asarray(dk))
    np.testing.assert_array_equal(np.asarray(pref), np.asarray(pk))


def test_dest_tiled_scan(monkeypatch):
    """Large-K path: when the (BK, K) tile exceeds VMEM, the dest dim is
    tiled and the carry ping-pongs — must stay bit-exact."""
    import flash_viterbi_tpu.ops.pallas.maxplus as pk
    from flash_viterbi_tpu.models.generate import make_sparse_hmm

    monkeypatch.setattr(pk, "_VMEM_BUDGET", 2 * 128 * 256 * 4)  # BI=256 @ K=512
    hmm, y = make_sparse_hmm(K=512, M=8, T=12, prob=0.2, seed=9)
    lh = hmm.log()
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    emits = logB[:, jnp.asarray(y, jnp.int32)].T
    d0 = logPi + emits[0]
    assert pk._pick_tiles(512) == (128, 256)
    dref, pref = mp.forward_scan(d0, logA, emits[1:])
    dk, pkk = pk.maxplus_scan.__wrapped__(logA, emits[1:][:, None, :],
                                          d0[None, :], interpret=True)
    np.testing.assert_array_equal(np.asarray(dref), np.asarray(dk[0]))
    np.testing.assert_array_equal(np.asarray(pref), np.asarray(pkk[:, 0, :]))


def test_batched_scan(small_problem):
    hmm, y = small_problem
    logA, logB, logPi = _tables(hmm)
    emits = logB[:, jnp.asarray(y, jnp.int32)].T
    d0 = logPi + emits[0]
    N = 4
    d0N = jnp.stack([d0, d0 + 1, d0 * 0.5, d0 - 2]).astype(jnp.float32)
    emitsN = jnp.stack([emits[1:]] * N, axis=1)
    dfN, pN = maxplus_scan(logA, emitsN, d0N, interpret=True)
    for n in range(N):
        dr, pr = mp.forward_scan(d0N[n], logA, emits[1:])
        np.testing.assert_array_equal(np.asarray(dr), np.asarray(dfN[n]))
        np.testing.assert_array_equal(np.asarray(pr), np.asarray(pN[:, n, :]))


def test_flash_pallas_matches_xla(small_problem):
    hmm, y = small_problem
    x = decode(hmm, y, algorithm="flash", num_segments=4, use_pallas=False,
               warmup=False)
    p = decode(hmm, y, algorithm="flash", num_segments=4, use_pallas=True,
               warmup=False)
    np.testing.assert_array_equal(x.path, p.path)


def test_emitgather_scan_matches_xla(small_problem):
    from flash_viterbi_tpu.ops.pallas.maxplus import maxplus_scan_emitgather

    hmm, y = small_problem
    logA, logB, logPi = _tables(hmm)
    yj = jnp.asarray(y, jnp.int32)
    emits = logB[:, yj].T
    d0 = logPi + emits[0]
    dref, pref = mp.forward_scan(d0, logA, emits[1:])
    dk, pk = maxplus_scan_emitgather(logA, jnp.transpose(logB), yj[1:, None],
                                     d0[None, :], interpret=True)
    np.testing.assert_array_equal(np.asarray(dref), np.asarray(dk[0]))
    np.testing.assert_array_equal(np.asarray(pref), np.asarray(pk[:, 0, :]))


def test_checkpoint_pallas_matches_vanilla(small_problem):
    hmm, y = small_problem
    v = decode(hmm, y, algorithm="vanilla", warmup=False)
    for step in (0, 5):
        c = decode(hmm, y, algorithm="checkpoint", warmup=False,
                   use_pallas=True, step=step)
        np.testing.assert_array_equal(v.path, c.path)


def test_flash_lean_pallas_matches_vanilla(small_problem):
    hmm, y = small_problem
    v = decode(hmm, y, algorithm="vanilla", warmup=False, pad_to=1)
    a = decode(hmm, y, algorithm="flash", mode="lean", num_segments=4,
               use_pallas=True, warmup=False, pad_to=1)
    np.testing.assert_array_equal(v.path, a.path)


def test_flash_lean_pallas_chunk_boundary():
    """T past the chunk size exercises the chunked t2/plane folding."""
    from flash_viterbi_tpu.models.generate import make_sparse_hmm

    hmm, y = make_sparse_hmm(K=48, M=8, T=70, prob=0.3, seed=5)
    v = decode(hmm, y, algorithm="vanilla", warmup=False, pad_to=1)
    a = decode(hmm, y, algorithm="flash", mode="lean", num_segments=4,
               use_pallas=True, warmup=False, pad_to=1)
    np.testing.assert_array_equal(v.path, a.path)


def test_preprocessing_cache(tmp_path, small_problem):
    from flash_viterbi_tpu.utils.cache import cached_adjacency, cached_log_tables

    hmm, _ = small_problem
    lh1 = cached_log_tables(hmm, cache_dir=str(tmp_path), seed=7)
    lh2 = cached_log_tables(hmm, cache_dir=str(tmp_path), seed=7)  # from disk
    np.testing.assert_array_equal(lh1.logA, lh2.logA)
    adj1 = cached_adjacency(hmm.A, hmm.B, cache_dir=str(tmp_path), seed=7)
    adj2 = cached_adjacency(hmm.A, hmm.B, cache_dir=str(tmp_path), seed=7)
    np.testing.assert_array_equal(adj1[0], adj2[0])
    assert adj1[1] == adj2[1]


def test_fused_decoder_matches_vanilla(small_problem):
    hmm, y = small_problem
    v = decode(hmm, y, algorithm="vanilla", warmup=False)
    f = decode(hmm, y, algorithm="fused", use_pallas=True, warmup=False)
    np.testing.assert_array_equal(v.path, f.path)
    f2 = decode(hmm, y, algorithm="fused", use_pallas=False, warmup=False)
    np.testing.assert_array_equal(v.path, f2.path)


def test_beam_scan_kernel_matches_xla(small_problem):
    """Fused beam-scan kernel (interpret) vs the XLA beam path."""
    import jax.numpy as jnp

    from flash_viterbi_tpu.algorithms.beam import beam_decode

    hmm, y = small_problem
    lh = hmm.log()
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    yd = jnp.asarray(np.asarray(y), jnp.int32)
    for bw in (8, 16):
        a = np.asarray(beam_decode(logA, logB, logPi, yd, beam_width=bw,
                                   use_pallas=False))
        b = np.asarray(beam_decode(logA, logB, logPi, yd, beam_width=bw,
                                   use_pallas=True))
        np.testing.assert_array_equal(a, b)


def test_flash_bs_kernel_phase1_matches_xla(medium_problem):
    """flash_bs with the fused beam kernel (in-kernel anchor planes) vs XLA."""
    import jax.numpy as jnp

    from flash_viterbi_tpu.algorithms.flash_bs import flash_bs_decode

    hmm, y = medium_problem
    lh = hmm.log()
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    yd = jnp.asarray(np.asarray(y), jnp.int32)
    a = np.asarray(flash_bs_decode(logA, logB, logPi, yd, beam_width=16,
                                   num_segments=4, use_pallas=False))
    b = np.asarray(flash_bs_decode(logA, logB, logPi, yd, beam_width=16,
                                   num_segments=4, use_pallas=True))
    np.testing.assert_array_equal(a, b)


def test_backtrack_kernel_matches_xla():
    """Chunk-streamed Pallas backtrack vs the XLA reverse scan, including
    non-multiple-of-chunk T (identity-row padding) and tiny shapes."""
    from flash_viterbi_tpu.ops.pallas.backtrack import backtrack_pallas

    rng = np.random.default_rng(42)
    # (12, 16384) pins the config-5 K: chunk clamps to the 2 MB DMA budget
    for T, K in [(1, 8), (7, 16), (64, 128), (130, 256), (513, 384),
                 (1000, 64), (12, 16384)]:
        ptrs = jnp.asarray(rng.integers(0, K, size=(T, K)).astype(np.int32))
        last = jnp.asarray(np.int32(rng.integers(0, K)))
        ref = mp.backtrack(ptrs, last)
        got = backtrack_pallas(ptrs, last, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_backtrack_kernel_batched():
    """vmap over the lane axis (external-caller shape): the custom_vmap
    rule must route to the batched kernel, never vmap the pallas_call."""
    import functools

    from flash_viterbi_tpu.ops.pallas.backtrack import backtrack_pallas

    rng = np.random.default_rng(3)
    T, Bs, K = 37, 4, 128
    ptrs = jnp.asarray(rng.integers(0, K, size=(T, Bs, K)).astype(np.int32))
    last = jnp.asarray(rng.integers(0, K, size=(Bs,)).astype(np.int32))
    ref = jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last)
    walk = functools.partial(backtrack_pallas, interpret=True)
    got = jax.vmap(walk, in_axes=(1, 0))(ptrs, last)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_backtrack_kernel_batched_direct():
    """Native batched API over multi-chunk (G>1) ragged tables — the
    round-2 lowering failure shapes, pinned in interpret mode too."""
    from flash_viterbi_tpu.ops.pallas.backtrack import backtrack_pallas_batched

    rng = np.random.default_rng(9)
    for T, N, K in [(1, 3, 16), (37, 4, 128), (1000, 3, 512), (130, 8, 256),
                    (513, 1, 384)]:
        ptrs = jnp.asarray(rng.integers(0, K, size=(T, N, K)).astype(np.int32))
        last = jnp.asarray(rng.integers(0, K, size=(N,)).astype(np.int32))
        ref = jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last)
        got = backtrack_pallas_batched(ptrs, last, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got),
                                      err_msg=f"T={T} N={N} K={K}")


def test_backtrack_unsupported_shape_falls_back():
    """Shapes whose minimum block exceeds VMEM route to the XLA walk —
    the dispatch never crashes (round-2 lesson: guards must guard)."""
    from flash_viterbi_tpu.ops.pallas.backtrack import (
        backtrack_pallas_batched, backtrack_supported)

    N, K = 64, 16384  # 8*N*K*4*2 = 32 MB > VMEM
    assert not backtrack_supported(N, K)
    rng = np.random.default_rng(11)
    ptrs = jnp.asarray(rng.integers(0, K, size=(5, N, K)).astype(np.int32))
    last = jnp.asarray(rng.integers(0, K, size=(N,)).astype(np.int32))
    ref = jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last)
    got = backtrack_pallas_batched(ptrs, last, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_scan_deltas_and_argmax_walk():
    """Recompute-argmax pipeline (SURVEY §7 trade): maxplus_scan_deltas +
    argmax_walk_pallas must reproduce maxplus_scan + backtrack BIT-exactly
    — same fp32 sums drive both argmaxes, lowest index on ties."""
    from flash_viterbi_tpu.ops.pallas.backtrack import argmax_walk_pallas
    from flash_viterbi_tpu.ops.pallas.maxplus import (maxplus_scan,
                                                      maxplus_scan_deltas)

    rng = np.random.default_rng(3)
    for Tm, N, K in [(1, 2, 256), (7, 1, 256), (37, 4, 128), (130, 3, 256),
                     (16, 8, 384)]:
        logA = jnp.asarray(rng.standard_normal((K, K)).astype(np.float32))
        # exact ties: duplicate source rows
        logA = logA.at[5].set(logA[9])
        emits = jnp.asarray(rng.standard_normal((Tm, N, K)).astype(np.float32))
        delta0 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))

        dfin, ptrs = maxplus_scan(logA, emits, delta0, interpret=True)
        dfin2, deltas = maxplus_scan_deltas(logA, emits, delta0,
                                            interpret=True)
        np.testing.assert_array_equal(np.asarray(dfin), np.asarray(dfin2),
                                      err_msg=f"dfin {Tm},{N},{K}")
        np.testing.assert_array_equal(np.asarray(deltas[0]),
                                      np.asarray(delta0))
        last = jnp.argmax(dfin, axis=1).astype(jnp.int32)
        want = jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last)
        got = argmax_walk_pallas(deltas, jnp.transpose(logA), last,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got),
                                      err_msg=f"walk {Tm},{N},{K}")


def test_fused_batch_recompute_pointers():
    """pointers='recompute' must be bit-identical to 'store' through the
    public batched decode."""
    from flash_viterbi_tpu.algorithms.fused import fused_decode_batch
    from flash_viterbi_tpu.models.generate import make_sparse_hmm

    hmm, y0 = make_sparse_hmm(K=120, M=10, T=33, prob=0.2, seed=4)
    lh = hmm.log().padded(128)
    rng = np.random.default_rng(6)
    ys = jnp.asarray(np.stack(
        [np.asarray(y0, np.int32)]
        + [rng.integers(0, 10, 33).astype(np.int32) for _ in range(5)]))
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    a = fused_decode_batch(logA, logB, logPi, ys, use_pallas=True,
                           pointers="store")
    b = fused_decode_batch(logA, logB, logPi, ys, use_pallas=True,
                           pointers="recompute")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_argmax_walk_nonresident_route():
    """K=2048 exceeds the resident-walk VMEM gate — the HBM 8-row-block
    DMA route must agree too."""
    from flash_viterbi_tpu.ops.pallas.backtrack import argmax_walk_pallas
    from flash_viterbi_tpu.ops.pallas.maxplus import maxplus_scan

    rng = np.random.default_rng(12)
    Tm, N, K = 11, 2, 2048
    logA = jnp.asarray(rng.standard_normal((K, K)).astype(np.float32))
    emits = jnp.asarray(rng.standard_normal((Tm, N, K)).astype(np.float32))
    delta0 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
    dfin, ptrs = maxplus_scan(logA, emits, delta0, interpret=True)
    last = jnp.argmax(dfin, axis=1).astype(jnp.int32)
    want = jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last)
    got = argmax_walk_pallas(
        jnp.concatenate([delta0[None],
                         jnp.zeros((0, N, K), jnp.float32)])
        if False else _deltas_of(logA, emits, delta0),
        jnp.transpose(logA), last, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def _deltas_of(logA, emits, delta0):
    from flash_viterbi_tpu.ops.pallas.maxplus import maxplus_scan_deltas
    _, deltas = maxplus_scan_deltas(logA, emits, delta0, interpret=True)
    return deltas
