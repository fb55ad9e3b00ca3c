"""flash_decode_long (host-phased dispatches) must be bit-identical to
flash pointer mode: same kernels, same order — only the dispatch
boundaries differ (the axon tunnel's per-dispatch execution ceiling is
why it exists; see algorithms/longform.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

import flash_viterbi_tpu as fvt
from flash_viterbi_tpu.algorithms.flash import flash_decode
from flash_viterbi_tpu.algorithms.longform import (
    flash_decode_long,
    flash_decode_long_batch,
)


def _tables(hmm):
    lh = hmm.log().padded(8)
    return (jnp.asarray(lh.logA), jnp.asarray(lh.logB), jnp.asarray(lh.logPi))


@pytest.mark.parametrize("N,group", [(4, 16), (4, 64), (2, 7), (1, 16),
                                     (8, 1000)])
def test_long_matches_flash_pointer(N, group):
    hmm, y = fvt.make_sparse_hmm(K=96, M=10, T=64, prob=0.25, seed=11)
    logA, logB, logPi = _tables(hmm)
    ref = np.asarray(flash_decode(logA, logB, logPi,
                                  jnp.asarray(np.asarray(y), jnp.int32),
                                  num_segments=N, mode="pointer",
                                  use_pallas=True))
    got = flash_decode_long(logA, logB, logPi, y, num_segments=N,
                            group_steps=group)
    np.testing.assert_array_equal(ref, got)


def test_long_group_boundary_invariance():
    """Splitting the scan at any dispatch boundary is the same computation:
    every group size must give one identical path."""
    hmm, y = fvt.make_sparse_hmm(K=64, M=8, T=48, prob=0.3, seed=5)
    logA, logB, logPi = _tables(hmm)
    paths = [flash_decode_long(logA, logB, logPi, y, num_segments=4,
                               group_steps=g) for g in (5, 12, 47, 1000)]
    for p in paths[1:]:
        np.testing.assert_array_equal(paths[0], p)


def test_long_batch():
    hmm, y0 = fvt.make_sparse_hmm(K=64, M=8, T=32, prob=0.3, seed=7)
    logA, logB, logPi = _tables(hmm)
    rng = np.random.RandomState(1)
    ys = np.stack([np.asarray(y0, np.int32),
                   rng.randint(0, 8, 32).astype(np.int32)])
    got = flash_decode_long_batch(logA, logB, logPi, ys, num_segments=4,
                                  group_steps=16)
    for b in range(2):
        ref = np.asarray(flash_decode(logA, logB, logPi,
                                      jnp.asarray(ys[b]), num_segments=4,
                                      mode="pointer", use_pallas=True))
        np.testing.assert_array_equal(ref, got[b])


def test_flash_long_registered():
    """Public API: algorithm='flash_long' decodes via the host-phased path
    with flash pointer-mode's reference-exact memory accounting."""
    hmm, y = fvt.make_sparse_hmm(K=96, M=10, T=48, prob=0.25, seed=11)
    r = fvt.decode(hmm, y, algorithm="flash_long", num_segments=4,
                   warmup=False)
    ref = fvt.decode(hmm, y, algorithm="flash", num_segments=4, warmup=False)
    np.testing.assert_array_equal(np.asarray(r.path), np.asarray(ref.path))
    assert r.memory_bytes == ref.memory_bytes


def test_long_batched_matches_per_sequence():
    """The batched pipeline (shared phase-1 stream, checkpoint+recompute
    walk, lane-batched phase 2) must be BIT-identical to per-sequence
    flash_decode_long — and therefore to flash pointer mode."""
    from flash_viterbi_tpu.algorithms.longform import flash_decode_long_batched

    hmm, y0 = fvt.make_sparse_hmm(K=96, M=10, T=64, prob=0.25, seed=11)
    logA, logB, logPi = _tables(hmm)
    rng = np.random.RandomState(3)
    ys = np.stack([np.asarray(y0, np.int32)]
                  + [rng.randint(0, 10, 64).astype(np.int32)
                     for _ in range(3)])
    for N, group in [(4, 16), (2, 13), (1, 29)]:
        got = flash_decode_long_batched(logA, logB, logPi, ys,
                                        num_segments=N, group_steps=group)
        for b in range(4):
            ref = flash_decode_long(logA, logB, logPi, ys[b],
                                    num_segments=N, group_steps=group)
            np.testing.assert_array_equal(ref, got[b],
                                          err_msg=f"N={N} g={group} b={b}")


def test_long_batched_cross_pipeline_f64_identity():
    """Config-5's PRIMARY validation gate (VERDICT r3 item 7): the f64
    path score must be BIT-identical between the batched and per-sequence
    pipelines (different dispatch grouping and walk batching) — the
    strong witness, replacing the wide calibrated tolerance as the gate.
    scripts/config5_full.py applies the same gate at the full spec scale."""
    from flash_viterbi_tpu.algorithms.longform import (
        flash_decode_long, flash_decode_long_batched)
    from flash_viterbi_tpu.oracle.validate import log_path_score_f64

    hmm, y0 = fvt.make_sparse_hmm(K=128, M=10, T=96, prob=0.2, seed=13)
    lh = hmm.log()
    logA, logB, logPi = _tables(hmm)
    rng = np.random.RandomState(5)
    ys = np.stack([np.asarray(y0, np.int32),
                   rng.randint(0, 10, 96).astype(np.int32)])
    got = flash_decode_long_batched(logA, logB, logPi, ys,
                                    num_segments=4, group_steps=31)
    for b in range(2):
        alt = flash_decode_long(logA, logB, logPi, ys[b],
                                num_segments=4, group_steps=17)
        s_b = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys[b], got[b])
        s_a = log_path_score_f64(lh.logA, lh.logB, lh.logPi, ys[b], alt)
        assert np.isfinite(s_b)
        assert s_b == s_a, (b, s_b, s_a)  # bit identity, not tolerance
