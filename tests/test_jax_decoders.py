"""JAX decoder correctness: bit-exact vs the framework-semantics numpy
mirrors, cross-algorithm equality, and padding invariance."""

import jax
import numpy as np
import pytest

from flash_viterbi_tpu import decode
from flash_viterbi_tpu.oracle import framework as ofw
from flash_viterbi_tpu.oracle import reference as oref


def test_vanilla_matches_numpy_mirror(small_problem):
    hmm, y = small_problem
    want = ofw.vanilla(hmm.A, hmm.B, hmm.Pi, y)
    got = decode(hmm, y, algorithm="vanilla", warmup=False)
    np.testing.assert_array_equal(got.path, want)


def test_vanilla_matches_reference_f32_semantics(small_problem):
    """The framework numerics contract == oracle.reference numerics='f32'."""
    hmm, y = small_problem
    want = oref.vanilla(hmm.A, hmm.B, hmm.Pi, y, numerics="f32")
    got = decode(hmm, y, algorithm="vanilla", warmup=False)
    np.testing.assert_array_equal(got.path, want)


@pytest.mark.parametrize("step", [0, 3, 5])
def test_checkpoint_equals_vanilla(small_problem, step):
    hmm, y = small_problem
    v = decode(hmm, y, algorithm="vanilla", warmup=False)
    c = decode(hmm, y, algorithm="checkpoint", step=step, warmup=False)
    np.testing.assert_array_equal(v.path, c.path)


@pytest.mark.parametrize("mode", ["pointer", "lean"])
@pytest.mark.parametrize("segments", [1, 2, 4, 7])
def test_flash_equals_vanilla(small_problem, mode, segments):
    hmm, y = small_problem
    v = decode(hmm, y, algorithm="vanilla", warmup=False)
    f = decode(hmm, y, algorithm="flash", num_segments=segments, mode=mode, warmup=False)
    np.testing.assert_array_equal(v.path, f.path)


@pytest.mark.parametrize("segments", [1, 4])
def test_flash_medium(medium_problem, segments):
    hmm, y = medium_problem
    v = decode(hmm, y, algorithm="vanilla", warmup=False)
    f = decode(hmm, y, algorithm="flash", num_segments=segments, warmup=False)
    np.testing.assert_array_equal(v.path, f.path)


def test_flash_bs_full_beam_equals_vanilla(small_problem):
    hmm, y = small_problem
    v = decode(hmm, y, algorithm="vanilla", warmup=False)
    f = decode(hmm, y, algorithm="flash_bs", beam_width=hmm.K, num_segments=4,
               pad_to=1, warmup=False)
    np.testing.assert_array_equal(v.path, f.path)


@pytest.mark.parametrize("beam,segments", [(16, 1), (16, 4), (32, 4)])
def test_flash_bs_matches_numpy_mirror(small_problem, beam, segments):
    hmm, y = small_problem
    want = ofw.flash_bs(hmm.A, hmm.B, hmm.Pi, y, beam_width=beam, num_segments=segments)
    got = decode(hmm, y, algorithm="flash_bs", beam_width=beam,
                 num_segments=segments, pad_to=1, warmup=False)
    np.testing.assert_array_equal(got.path, want)


def test_padding_invariance(small_problem):
    """Padding the state dimension must never change the decoded path."""
    hmm, y = small_problem
    p1 = decode(hmm, y, algorithm="flash", num_segments=4, pad_to=1, warmup=False)
    p128 = decode(hmm, y, algorithm="flash", num_segments=4, pad_to=128, warmup=False)
    np.testing.assert_array_equal(p1.path, p128.path)


def test_decode_result_protocol(small_problem):
    hmm, y = small_problem
    r = decode(hmm, y, algorithm="vanilla", warmup=False)
    out = r.reference_stdout()
    assert out.startswith("time: ")
    assert "path: [" in out and "memory: " in out
    assert r.memory_bytes > 0


@pytest.mark.parametrize("leaf", [0, 4, 64])
def test_lean_leaf_hybrid(small_problem, leaf):
    """Hybrid lean (binary-split to min_leaf, then batched pointer leaves)
    is bit-identical to vanilla at every leaf size (0 = the reference's
    full splitting)."""
    hmm, y = small_problem
    v = decode(hmm, y, algorithm="vanilla", pad_to=1, warmup=False)
    l = decode(hmm, y, algorithm="flash", mode="lean", num_segments=4,
               lean_leaf=leaf, pad_to=1, warmup=False)
    np.testing.assert_array_equal(l.path, v.path)


def test_auto_selection_rules():
    """auto picks the measured-fastest family per shape and respects the
    memory budget by falling back to leaner modes."""
    from flash_viterbi_tpu.algorithms.auto import choose, device_working_set

    assert choose(4096, 256) == ("flash", {"num_segments": 16})
    assert choose(1024, 256) == ("fused", {})  # VMEM-resident K
    # long T: fused + chunk-streamed backtrack measured 301 G vs
    # checkpoint's 146-223 G (round-3 hw queue) while the (T, K) pointer
    # table fits LONG_T_PTR_BUDGET; beyond it, checkpoint (no table)
    assert choose(1024, 65536)[0] == "fused"
    # config-5-class: one sweep alone exceeds the dispatch ceiling — only
    # the host-phased decoder can run (ceiling off -> checkpoint, the
    # leanest single-dispatch candidate)
    assert choose(16384, 65536)[0] == "flash_long"
    from flash_viterbi_tpu.algorithms import auto as auto_mod
    old = auto_mod.DISPATCH_CEILING_S
    try:
        auto_mod.DISPATCH_CEILING_S = 0.0
        assert choose(16384, 65536)[0] == "checkpoint"
    finally:
        auto_mod.DISPATCH_CEILING_S = old
    assert choose(1024, 8)[0] == "fused"
    assert choose(4096, 256, beam_width=64)[0] == "flash_bs"
    # a tiny budget can't shrink the beamed engine further: flash_bs is
    # already the only (and leanest) beamed candidate
    assert choose(4096, 256, memory_budget_bytes=1, beam_width=64)[0] == "flash_bs"
    # a budget below flash's pointer tables forces a leaner candidate
    flash_mem = device_working_set("flash", {"num_segments": 8}, 4096, 256)
    name, kw = choose(4096, 256, memory_budget_bytes=flash_mem - 1)
    assert (name, kw) != ("flash", {"num_segments": 8})
    assert device_working_set(name, kw, 4096, 256) < flash_mem
    # impossible budget: falls back to the candidate with the smallest
    # honest working set, never a crash.  With implementation-honest
    # scratch models that is checkpoint at short T (hybrid lean's leaf
    # pointer tables outweigh √T snapshots), and it must be minimal.
    name, kw = choose(4096, 256, memory_budget_bytes=1)
    cands = ["flash", "checkpoint", "fused"]
    ws = {n: device_working_set(n, {"mode": "lean"} if n == "flash" else {},
                                4096, 256) for n in cands}
    assert name == min(ws, key=ws.get) == "checkpoint"
    # caller overrides reach the budget filter: pure lean (lean_leaf=0)
    # re-scans with up to T/4 live intervals — a bigger streamed working
    # set than the hybrid's capped leaf pass
    ws_h = device_working_set("flash", {"mode": "lean"}, 4096, 256)
    ws_p = device_working_set("flash", {"mode": "lean", "lean_leaf": 0}, 4096, 256)
    assert ws_p > ws_h
    name, kw = choose(4096, 256, memory_budget_bytes=1, static={"num_segments": 32})
    assert kw["num_segments"] == 32


def test_auto_working_set_models_real_decode():
    """The budget filter must model the scratch the decode actually runs:
    checkpoint's snapshot spacing is the capped long-T step, not isqrt."""
    from flash_viterbi_tpu.algorithms.auto import device_working_set
    from flash_viterbi_tpu.algorithms.checkpoint import snapshot_step

    K, T = 16384, 65536
    step = snapshot_step(T)
    assert step == 1024  # the long-T cap checkpoint_decode_pallas uses
    got = device_working_set("checkpoint", {}, K, T)
    assert got == (T // step + 1) * K * 4 + step * K * 4
    # the config-5 figure the round-1 model underestimated ~2x: ~71 MB
    assert got > 60 * 1024 * 1024


def test_auto_memory_reporting_tracks_shape():
    """A reused auto Decoder must not report a stale choice recorded for a
    different shape (build() is public API; decode() rebuilds per call)."""
    from flash_viterbi_tpu.algorithms.auto import choose
    from flash_viterbi_tpu.algorithms.base import build

    import jax.numpy as jnp

    from flash_viterbi_tpu.models.generate import make_sparse_hmm

    d = build("auto")
    hmm, y = make_sparse_hmm(K=48, M=8, T=40, prob=0.2, seed=3)
    lh = hmm.log()
    d(jnp.asarray(lh.logA), jnp.asarray(lh.logB), jnp.asarray(lh.logPi),
      jnp.asarray(np.asarray(y), jnp.int32))  # records choice for (48, 40)
    # reporting for an unrelated long-T shape must re-derive its choice
    name, kw = choose(1024, 65536)
    want = build(name, **kw).analytic_memory(K=1024, T=65536)
    assert d.analytic_memory(K=1024, T=65536) == want


def test_auto_decodes_and_matches_vanilla(small_problem):
    hmm, y = small_problem
    want = decode(hmm, y, algorithm="vanilla", pad_to=1, warmup=False)
    got = decode(hmm, y, algorithm="auto", pad_to=1, warmup=False)
    np.testing.assert_array_equal(got.path, want.path)
    assert got.memory_bytes > 0
