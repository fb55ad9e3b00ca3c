"""Oracle self-consistency: the reference-semantics numpy decoders must agree
with brute force and with each other (the reference's own verification was
cross-implementation parity, README.md:71)."""

import itertools

import numpy as np
import pytest

from flash_viterbi_tpu.models.generate import make_sparse_hmm
from flash_viterbi_tpu.oracle import reference as oref


def brute_force(A, B, Pi, y):
    """Exhaustive max over all K^T paths (tiny problems only), fp64 scores,
    lowest lexicographic path on ties."""
    K = A.shape[0]
    T = len(y)
    with np.errstate(divide="ignore"):
        lA, lB, lPi = (np.log(x) for x in (A, B, Pi))
    best, best_path = -np.inf, None
    for path in itertools.product(range(K), repeat=T):
        s = lPi[path[0]] + lB[path[0], y[0]]
        for t in range(1, T):
            s += lA[path[t - 1], path[t]] + lB[path[t], y[t]]
        if s > best:
            best, best_path = s, path
    return np.array(best_path)


def tiny_problem(seed=0, K=5, M=4, T=6):
    rng = np.random.RandomState(seed)
    A = rng.uniform(0.1, 1.0, (K, K))
    A /= A.sum(1, keepdims=True)
    B = rng.uniform(0.1, 1.0, (K, M))
    B /= B.sum(1, keepdims=True)
    Pi = np.full(K, 1.0 / K)
    y = rng.randint(0, M, T)
    return A, B, Pi, y


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vanilla_matches_brute_force(seed):
    A, B, Pi, y = tiny_problem(seed)
    got = oref.vanilla(A, B, Pi, y, numerics="c")
    want = brute_force(A, B, Pi, y)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("numerics", ["c", "f32"])
def test_checkpoint_equals_vanilla(small_problem, numerics):
    hmm, y = small_problem
    v = oref.vanilla(hmm.A, hmm.B, hmm.Pi, y, numerics=numerics)
    c = oref.checkpoint(hmm.A, hmm.B, hmm.Pi, y, numerics=numerics)
    np.testing.assert_array_equal(v, c)


@pytest.mark.parametrize("threads", [1, 2, 4, 7])
@pytest.mark.parametrize("numerics", ["c", "f32"])
def test_flash_equals_vanilla(small_problem, threads, numerics):
    hmm, y = small_problem
    v = oref.vanilla(hmm.A, hmm.B, hmm.Pi, y, numerics=numerics)
    f = oref.flash(hmm.A, hmm.B, hmm.Pi, y, threads=threads, numerics=numerics)
    np.testing.assert_array_equal(v, f)


def test_flash_bs_full_beam_reasonable(small_problem):
    """With B=K the beam is lossless; the heap's quirky final argmax
    (leaf-scan, SURVEY.md §3.6 quirk (a)) may pick a different *final* state,
    so compare path log-likelihood instead of exact states."""
    hmm, y = small_problem
    K = hmm.K
    v = oref.vanilla(hmm.A, hmm.B, hmm.Pi, y, numerics="c")
    f = oref.flash_bs(hmm.A, hmm.B, hmm.Pi, y, beam_width=K, threads=1, numerics="c")
    with np.errstate(divide="ignore"):
        lA, lB, lPi = (np.log(x) for x in (hmm.A, hmm.B, hmm.Pi))

    def ll(p):
        s = lPi[p[0]] + lB[p[0], y[0]]
        s += sum(lA[p[t - 1], p[t]] + lB[p[t], y[t]] for t in range(1, len(y)))
        return s

    assert ll(f) <= ll(v) + 1e-6
    # the bulk of the path must agree even when the final state differs
    assert (v[:-1] == f[:-1]).mean() > 0.9


@pytest.mark.parametrize("threads", [1, 4])
def test_flash_bs_runs_and_beam_grows_monotone(small_problem, threads):
    hmm, y = small_problem
    p16 = oref.flash_bs(hmm.A, hmm.B, hmm.Pi, y, beam_width=16, threads=threads)
    p32 = oref.flash_bs(hmm.A, hmm.B, hmm.Pi, y, beam_width=32, threads=threads)
    assert p16.shape == y.shape and p32.shape == y.shape
