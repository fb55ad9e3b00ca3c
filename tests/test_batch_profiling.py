"""decode_batch (vmap + mesh) and the observability utilities."""

import numpy as np

import flash_viterbi_tpu as fvt
from flash_viterbi_tpu.parallel.sharded import make_mesh
from flash_viterbi_tpu.utils.profiling import PhaseTimer, memory_report


def test_decode_batch_vmap(small_problem):
    hmm, y = small_problem
    rng = np.random.RandomState(1)
    ys = np.stack([y, rng.randint(0, hmm.M, len(y)).astype(np.int32)])
    r = fvt.decode_batch(hmm, ys, algorithm="vanilla", pad_to=1, warmup=False)
    assert r.path.shape == ys.shape
    for b in range(2):
        want = fvt.decode(hmm, ys[b], algorithm="vanilla", pad_to=1,
                          warmup=False)
        np.testing.assert_array_equal(r.path[b], want.path)


def test_decode_batch_host_driven(small_problem):
    """Non-jittable decoders (sieve_bs family) can't be vmapped — the
    batch path must loop them eagerly and still match per-sequence runs."""
    hmm, y = small_problem
    rng = np.random.RandomState(2)
    ys = np.stack([y, rng.randint(0, hmm.M, len(y)).astype(np.int32)])
    r = fvt.decode_batch(hmm, ys, algorithm="sieve_bs", beam_width=8,
                         pad_to=1, warmup=False)
    assert r.path.shape == ys.shape
    for b in range(2):
        want = fvt.decode(hmm, ys[b], algorithm="sieve_bs", beam_width=8,
                          pad_to=1, warmup=False)
        np.testing.assert_array_equal(r.path[b], want.path)


def test_decode_batch_mesh(small_problem):
    hmm, y = small_problem
    ys = np.stack([y] * 4)
    r = fvt.decode_batch(hmm, ys, mesh=make_mesh(2, 2, 2), num_segments=4,
                         warmup=False)
    want = fvt.decode(hmm, y, algorithm="flash", num_segments=4, warmup=False)
    np.testing.assert_array_equal(r.path, np.tile(want.path, (4, 1)))
    assert r.extra["mesh"] == {"data": 2, "seq": 2, "state": 2}


def test_phase_timer_and_memory_report():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report(K=10, T=5)
    assert list(rep["phases"]) == ["a", "b"]
    assert rep["trellis_updates_per_s"] > 0
    assert t.json(K=10, T=5).startswith("{")
    mem = memory_report()
    assert mem["live_array_bytes"] >= 0


def test_profile_flash_phases(small_problem):
    from flash_viterbi_tpu.utils.profiling import profile_flash

    hmm, y = small_problem
    rep = profile_flash(hmm, y, num_segments=4, pad_to=1, reps=2)
    assert set(rep) >= {"phase1_s", "phase2_and_backtrack_s", "total_s",
                        "trellis_updates_per_s"}
    assert rep["total_s"] >= 0 and rep["phase1_s"] >= 0
