"""Hardware-tier tests: real-Mosaic kernel parity on the physical chip.

Run with ``FVT_TPU_TESTS=1 python -m pytest tests/ -m tpu -q`` (one TPU
process at a time — see the verify skill).  The CPU suite validates the
same kernels in the Pallas interpreter; this tier pins the behaviors that
can drift between the interpreter and real Mosaic lowering: exact fp32
tie-breaking, tiled-vs-resident mode agreement, and the sharded (1,1,1)
pipeline on the real kernel path.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend attached")
    return jax


def test_kernel_tie_breaking_on_hw(tpu_backend):
    """Lowest-index argmax on exact fp32 ties — real Mosaic, not interpreter."""
    import jax.numpy as jnp

    from flash_viterbi_tpu.ops.pallas.maxplus import maxplus_scan

    K = 256
    rng = np.random.RandomState(0)
    logA = rng.randn(K, K).astype(np.float32)
    logA[5, :] = logA[9, :]  # exact duplicate source rows -> ties everywhere
    delta0 = rng.randn(1, K).astype(np.float32)
    delta0[0, 5] = delta0[0, 9]
    emits = rng.randn(4, 1, K).astype(np.float32)
    dfin, ptrs = maxplus_scan(jnp.asarray(logA), jnp.asarray(emits),
                              jnp.asarray(delta0))
    # numpy reference with first-occurrence argmax
    d = delta0[0]
    for t in range(4):
        s = d[:, None] + logA
        p = s.argmax(axis=0)
        d = s.max(axis=0) + emits[t, 0]
        np.testing.assert_array_equal(np.asarray(ptrs)[t, 0], p)
    np.testing.assert_array_equal(np.asarray(dfin)[0], d)


def test_fused_equals_vanilla_on_hw(tpu_backend):
    import flash_viterbi_tpu as fvt

    hmm, y = fvt.make_sparse_hmm(K=96, M=10, T=48, prob=0.25, seed=11)
    v = fvt.decode(hmm, y, algorithm="vanilla", warmup=False)
    f = fvt.decode(hmm, y, algorithm="fused", warmup=False)
    np.testing.assert_array_equal(v.path, f.path)


def test_flash_modes_agree_on_hw(tpu_backend):
    import flash_viterbi_tpu as fvt

    hmm, y = fvt.make_sparse_hmm(K=96, M=10, T=48, prob=0.25, seed=11)
    v = fvt.decode(hmm, y, algorithm="vanilla", warmup=False)
    for kw in ({"mode": "pointer"}, {"mode": "lean"}, {"mode": "lean", "lean_leaf": 0}):
        r = fvt.decode(hmm, y, algorithm="flash", num_segments=6, warmup=False, **kw)
        np.testing.assert_array_equal(v.path, r.path, err_msg=str(kw))


def test_sharded_single_chip_kernel_path(tpu_backend):
    """The pipelined sharded decode on a (1,1,1) real-chip mesh with the
    kernel enabled must equal the single-chip flash path."""
    import jax.numpy as jnp

    import flash_viterbi_tpu as fvt
    from flash_viterbi_tpu.algorithms.flash import flash_decode
    from flash_viterbi_tpu.parallel.sharded import flash_decode_sharded, make_mesh

    hmm, y = fvt.make_sparse_hmm(K=128, M=10, T=64, prob=0.2, seed=5)
    lh = hmm.log()
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    ys = jnp.stack([jnp.asarray(np.asarray(y), jnp.int32)] * 2)
    out = np.asarray(flash_decode_sharded(make_mesh(1, 1, 1), logA, logB,
                                          logPi, ys, num_segments=4,
                                          pipeline=True))
    ref = np.asarray(flash_decode(logA, logB, logPi,
                                  jnp.asarray(np.asarray(y), jnp.int32),
                                  num_segments=4))
    np.testing.assert_array_equal(out, ref[None].repeat(2, axis=0))


def test_beam_kernel_on_hw(tpu_backend):
    """Fused beam-scan kernel on real Mosaic (dynamic-row DMAs, in-kernel
    top-B) vs the XLA beam path."""
    import jax.numpy as jnp

    import flash_viterbi_tpu as fvt
    from flash_viterbi_tpu.algorithms.beam import beam_decode

    hmm, y = fvt.make_sparse_hmm(K=128, M=10, T=48, prob=0.25, seed=11)
    lh = hmm.log()
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    yd = jnp.asarray(np.asarray(y), jnp.int32)
    a = np.asarray(beam_decode(logA, logB, logPi, yd, beam_width=16,
                               use_pallas=False))
    b = np.asarray(beam_decode(logA, logB, logPi, yd, beam_width=16,
                               use_pallas=True))
    np.testing.assert_array_equal(a, b)


def test_flash_bs_kernel_on_hw(tpu_backend):
    import jax.numpy as jnp

    import flash_viterbi_tpu as fvt
    from flash_viterbi_tpu.algorithms.flash_bs import flash_bs_decode

    hmm, y = fvt.make_sparse_hmm(K=128, M=10, T=48, prob=0.25, seed=11)
    lh = hmm.log()
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    yd = jnp.asarray(np.asarray(y), jnp.int32)
    a = np.asarray(flash_bs_decode(logA, logB, logPi, yd, beam_width=16,
                                   num_segments=4, use_pallas=False))
    b = np.asarray(flash_bs_decode(logA, logB, logPi, yd, beam_width=16,
                                   num_segments=4, use_pallas=True))
    np.testing.assert_array_equal(a, b)


def test_backtrack_kernel_on_hw(tpu_backend):
    """Chunk-streamed pointer walk on real Mosaic (dynamic-sublane reads,
    lane-select gather) vs the XLA reverse scan."""
    import jax.numpy as jnp

    from flash_viterbi_tpu.ops import maxplus as mp
    from flash_viterbi_tpu.ops.pallas.backtrack import backtrack_pallas

    rng = np.random.RandomState(5)
    for T, K in [(48, 128), (130, 256), (1000, 512)]:
        ptrs = jnp.asarray(rng.randint(0, K, size=(T, K)).astype(np.int32))
        last = jnp.asarray(np.int32(rng.randint(0, K)))
        a = np.asarray(mp.backtrack(ptrs, last))
        b = np.asarray(backtrack_pallas(ptrs, last))
        np.testing.assert_array_equal(a, b)


def test_backtrack_kernel_batched_on_hw(tpu_backend):
    """External vmap on real Mosaic — must route through the custom_vmap
    rule to the batched kernel (round 2: vmap-of-pallas_call produced a
    Mosaic-illegal SMEM block and killed every batched decode)."""
    import jax
    import jax.numpy as jnp

    from flash_viterbi_tpu.ops import maxplus as mp
    from flash_viterbi_tpu.ops.pallas.backtrack import backtrack_pallas

    rng = np.random.RandomState(7)
    T, Bs, K = 130, 4, 256
    ptrs = jnp.asarray(rng.randint(0, K, size=(T, Bs, K)).astype(np.int32))
    last = jnp.asarray(rng.randint(0, K, size=(Bs,)).astype(np.int32))
    a = np.asarray(jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last))
    b = np.asarray(jax.vmap(backtrack_pallas, in_axes=(1, 0))(ptrs, last))
    np.testing.assert_array_equal(a, b)


def test_backtrack_kernel_batched_direct_on_hw(tpu_backend):
    """Native batched API on real Mosaic, incl. multi-chunk G>1 ragged
    tables and the config-5 K=16384 lane bound."""
    import jax
    import jax.numpy as jnp

    from flash_viterbi_tpu.ops import maxplus as mp
    from flash_viterbi_tpu.ops.pallas.backtrack import backtrack_pallas_batched

    rng = np.random.RandomState(9)
    for T, N, K in [(37, 4, 128), (1000, 3, 512), (130, 8, 256),
                    (12, 8, 16384)]:
        ptrs = jnp.asarray(rng.randint(0, K, size=(T, N, K)).astype(np.int32))
        last = jnp.asarray(rng.randint(0, K, size=(N,)).astype(np.int32))
        a = np.asarray(jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last))
        b = np.asarray(backtrack_pallas_batched(ptrs, last))
        np.testing.assert_array_equal(a, b, err_msg=f"T={T} N={N} K={K}")


def test_sieve_bs_mp_mirror_on_hw(tpu_backend):
    """Device sieve_bs_mp (fused-kernel first step + beam-space scan) must
    be bit-exact with the fp32 framework mirror on real Mosaic — this is
    the decoder whose dense first step runs the Pallas kernel at
    headline K."""
    import flash_viterbi_tpu as fvt
    from flash_viterbi_tpu.oracle.framework import sieve_bs_mp as mirror

    hmm, y = fvt.make_sparse_hmm(K=256, M=10, T=24, prob=0.1, seed=13)
    want = mirror(hmm.A, hmm.B, hmm.Pi, y, beam_width=8)
    r = fvt.decode(hmm, y, algorithm="sieve_bs_mp", beam_width=8,
                   pad_to=1, warmup=False)
    np.testing.assert_array_equal(np.asarray(r.path), want)


def test_step_block_kernel_on_hw(tpu_backend):
    """The rectangular tensor-parallel step kernel (maxplus_step_block,
    the n_state>1 sharded path's workhorse) on real Mosaic: values, global
    source indices, and lowest-index tie-breaking vs the XLA computation."""
    import jax.numpy as jnp

    from flash_viterbi_tpu.ops.pallas.maxplus import (
        maxplus_step_block,
        step_block_supported,
    )

    Ks, Kd, N = 512, 256, 4  # a (K=512) -> two 256-column shards' worth
    assert step_block_supported(Ks, Kd)
    rng = np.random.RandomState(3)
    logA_blk = rng.randn(Ks, Kd).astype(np.float32)
    logA_blk[17, :] = logA_blk[3, :]  # duplicate source rows -> exact ties
    delta = rng.randn(N, Ks).astype(np.float32)
    delta[:, 17] = delta[:, 3]
    val, ptr = maxplus_step_block(jnp.asarray(delta), jnp.asarray(logA_blk))
    scores = delta[:, :, None] + logA_blk[None]
    np.testing.assert_array_equal(np.asarray(val), scores.max(axis=1))
    np.testing.assert_array_equal(np.asarray(ptr), scores.argmax(axis=1))


def test_beam_kernel_large_K_on_hw(tpu_backend):
    """Beam kernel at a large tiled K (the K=3968 class): single-row HBM
    slices of an (8,128)-tiled memref don't lower — the aligned-8-row-DMA
    design must, and must stay bit-exact with the XLA beam path."""
    import jax.numpy as jnp

    import flash_viterbi_tpu as fvt
    from flash_viterbi_tpu.algorithms.beam import beam_decode

    hmm, y = fvt.make_sparse_hmm(K=1530, M=12, T=40, prob=0.05, seed=3)
    lh = hmm.log().padded(128)  # K -> 1536: multi-tile rows, aligned blocks
    logA, logB, logPi = (jnp.asarray(x) for x in (lh.logA, lh.logB, lh.logPi))
    yd = jnp.asarray(np.asarray(y), jnp.int32)
    a = np.asarray(beam_decode(logA, logB, logPi, yd, beam_width=24,
                               use_pallas=False))
    b = np.asarray(beam_decode(logA, logB, logPi, yd, beam_width=24,
                               use_pallas=True))
    np.testing.assert_array_equal(a, b)


def test_scan_vmem_limit_K16384_on_hw(tpu_backend):
    """The K=16384 tiled scan must compile and run (round-3 regression:
    the default ~16 MB scoped-VMEM limit rejected its legitimate buffers
    and killed the sharded/config-5 path at trace time)."""
    import jax.numpy as jnp

    from flash_viterbi_tpu.ops import maxplus as mp
    from flash_viterbi_tpu.ops.pallas.maxplus import maxplus_scan

    K, N, Tm = 16384, 4, 3
    rng = np.random.RandomState(5)
    logA = jnp.asarray(rng.randn(K, K).astype(np.float32))
    emits = jnp.asarray(rng.randn(Tm, N, K).astype(np.float32))
    delta0 = jnp.asarray(rng.randn(N, K).astype(np.float32))
    dfin, ptrs = maxplus_scan(logA, emits, delta0)
    # spot-check one lane against the XLA step on the final state row
    want = delta0
    for t in range(Tm):
        nxt = []
        for n in range(N):
            d, _ = mp.maxplus_step(want[n], logA, emits[t, n])
            nxt.append(d)
        want = jnp.stack(nxt)
    np.testing.assert_allclose(np.asarray(dfin), np.asarray(want), rtol=0, atol=0)


def test_recompute_argmax_pipeline_on_hw(tpu_backend):
    """scan_deltas + argmax_walk (recompute-on-backtrack) must bit-match
    the stored-pointer pipeline on real Mosaic — incl. the masked ragged
    walk the flash phase 2 uses and the batched fused dispatch."""
    import jax
    import jax.numpy as jnp

    from flash_viterbi_tpu.algorithms.fused import fused_decode_batch
    from flash_viterbi_tpu.models.generate import make_sparse_hmm
    from flash_viterbi_tpu.ops import maxplus as mp
    from flash_viterbi_tpu.ops.pallas.backtrack import argmax_walk_pallas
    from flash_viterbi_tpu.ops.pallas.maxplus import (maxplus_scan,
                                                      maxplus_scan_deltas)

    rng = np.random.RandomState(2)
    Tm, N, K = 45, 6, 512
    logA = jnp.asarray(rng.randn(K, K).astype(np.float32))
    logA = logA.at[5].set(logA[9])  # exact ties
    emits = jnp.asarray(rng.randn(Tm, N, K).astype(np.float32))
    delta0 = jnp.asarray(rng.randn(N, K).astype(np.float32))
    dfin, ptrs = maxplus_scan(logA, emits, delta0)
    dfin2, deltas = maxplus_scan_deltas(logA, emits, delta0)
    np.testing.assert_array_equal(np.asarray(dfin), np.asarray(dfin2))
    last = jnp.argmax(dfin, axis=1).astype(jnp.int32)
    want = np.asarray(jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs, last))
    got = np.asarray(argmax_walk_pallas(deltas, jnp.transpose(logA), last))
    np.testing.assert_array_equal(want, got)
    # masked walk: invalidate a ragged tail per lane
    valid = jnp.asarray(
        np.arange(Tm)[:, None] < (Tm - np.arange(N))[None, :])
    iota = jnp.arange(K, dtype=jnp.int32)
    ptrs_m = jnp.where(valid[:, :, None], ptrs, iota[None, None, :])
    want_m = np.asarray(jax.vmap(mp.backtrack, in_axes=(1, 0))(ptrs_m, last))
    got_m = np.asarray(argmax_walk_pallas(deltas, jnp.transpose(logA), last,
                                          valid=valid))
    np.testing.assert_array_equal(want_m, got_m)
    # end-to-end: batched fused decode, both pipelines
    hmm, y0 = make_sparse_hmm(K=250, M=12, T=40, prob=0.1, seed=8)
    lh = hmm.log().padded(128)
    ys = jnp.asarray(np.stack([np.asarray(y0, np.int32)] * 4))
    a = fused_decode_batch(jnp.asarray(lh.logA), jnp.asarray(lh.logB),
                           jnp.asarray(lh.logPi), ys, pointers="store")
    b = fused_decode_batch(jnp.asarray(lh.logA), jnp.asarray(lh.logB),
                           jnp.asarray(lh.logPi), ys, pointers="recompute")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_walk_kernel_wide_lanes_on_hw(tpu_backend):
    """>= 64-lane recompute walk on real Mosaic (VERDICT r3 item 5: round
    3's unrolled per-lane DMA chains capped at 32 lanes by compile time;
    the fori-loop kernel must compile and stay bit-exact at N=64)."""
    import jax
    import jax.numpy as jnp

    from flash_viterbi_tpu.ops import maxplus as mp
    from flash_viterbi_tpu.ops.pallas.backtrack import (
        argmax_walk_pallas, argmax_walk_supported)
    from flash_viterbi_tpu.ops.pallas.maxplus import maxplus_scan_deltas

    Tm, N, K = 33, 64, 512
    assert argmax_walk_supported(N, K)
    rng = np.random.RandomState(4)
    logA = jnp.asarray(rng.randn(K, K).astype(np.float32))
    logA = logA.at[7].set(logA[3])  # exact ties
    emits = jnp.asarray(rng.randn(Tm, N, K).astype(np.float32))
    delta0 = jnp.asarray(rng.randn(N, K).astype(np.float32))
    dfin, deltas = maxplus_scan_deltas(logA, emits, delta0)
    last = jnp.argmax(dfin, axis=1).astype(jnp.int32)
    got = np.asarray(argmax_walk_pallas(deltas, jnp.transpose(logA), last))
    for n in (0, 31, 63):  # spot lanes vs the XLA pipeline
        _, ptrs = mp.forward_scan(delta0[n], logA, emits[:, n])
        want = np.asarray(mp.backtrack(ptrs, last[n]))
        np.testing.assert_array_equal(got[n], want)


def test_sieve_device_engines_on_hw(tpu_backend):
    """Round-5 on-device recursion engines on real hardware: the whole
    data-dependent tree as one dispatch must match the host scheduler
    (same per-node math, different execution) bit-for-bit."""
    import jax.numpy as jnp

    import flash_viterbi_tpu as fvt
    from flash_viterbi_tpu.algorithms.sieve_bs import sieve_bs_decode
    from flash_viterbi_tpu.algorithms.sieve_dyn import (
        sieve_dynamic_decode_many,
    )

    hmm, y = fvt.make_sparse_hmm(K=96, M=10, T=48, prob=0.15, seed=3)
    lh = hmm.log()
    tbl = (jnp.asarray(lh.logA), jnp.asarray(lh.logB),
           jnp.asarray(lh.logPi))
    dev = sieve_bs_decode(*tbl, np.asarray(y), beam_width=8,
                          engine="device")
    host = sieve_bs_decode(*tbl, np.asarray(y), beam_width=8,
                           engine="host")
    assert dev == host
    d2 = sieve_dynamic_decode_many(*tbl, np.asarray(y)[None],
                                   engine="device")[0]
    h2 = sieve_dynamic_decode_many(*tbl, np.asarray(y)[None],
                                   engine="host")[0]
    assert d2 == h2
