"""SIEVE family oracle parity.

* sieve_mp vs the compiled reference C binary (bit-exact paths).
* sieve_dynamic vs the reference *Python* ``Sieve.sieve`` run in-process
  from /root/reference (the original has no C port, SURVEY.md §2.3) —
  imported at test time, never copied.
* Log-likelihood sanity vs vanilla (SIEVE is an exact method; its paths may
  differ from vanilla's only through the reference's right-child re-argmax
  quirk, so we compare scores, not states).
"""

import io
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

from flash_viterbi_tpu.models.generate import make_sparse_hmm
from flash_viterbi_tpu.oracle import reference as oref
from flash_viterbi_tpu.oracle.sieve import sieve_dynamic, sieve_mp
from flash_viterbi_tpu.utils.io import save_dataset

from .ref_compile import build_and_run, have_gcc

REF_PY = "/root/reference/Base_line/Python implementations"


def _loglik(hmm, y, path):
    with np.errstate(divide="ignore"):
        lA, lB, lPi = (np.log(x) for x in (hmm.A, hmm.B, hmm.Pi))
    s = lPi[path[0]] + lB[path[0], y[0]]
    s += sum(lA[path[t - 1], path[t]] + lB[path[t], y[t]] for t in range(1, len(y)))
    return s


@pytest.mark.skipif(not have_gcc(), reason="gcc not available")
@pytest.mark.parametrize("K,M,T,prob,seed", [
    (64, 12, 32, 0.3, 7),
    (32, 8, 17, 0.4, 1),
    (48, 6, 33, 0.25, 11),
])
def test_sieve_mp_c_bit_parity(tmp_path, K, M, T, prob, seed):
    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=prob, seed=seed)
    d = tmp_path / "data"; d.mkdir()
    w = tmp_path / "work"; w.mkdir()
    save_dataset(str(d), hmm, y, prob=prob)
    want = build_and_run("sieve_mp", str(w), K, M, T, prob, str(d))
    got = sieve_mp(hmm.A, hmm.B, hmm.Pi, y, numerics="c")
    np.testing.assert_array_equal(got, want)


def test_sieve_mp_close_to_vanilla(small_problem):
    """SIEVE-Mp paths may differ from vanilla only where the reference's
    right-child re-argmax quirk bites (right recursions pass last=-1,
    SIEVE-Mp.c:452) — which can even yield A=0 transitions at segment
    boundaries (ll = -inf).  The real parity bar is the C binary
    (test_sieve_mp_c_bit_parity); here we check the bulk agrees."""
    hmm, y = small_problem
    v = oref.vanilla(hmm.A, hmm.B, hmm.Pi, y, numerics="c")
    s = sieve_mp(hmm.A, hmm.B, hmm.Pi, y, numerics="c")
    assert _loglik(hmm, y, s) <= _loglik(hmm, y, v) + 1e-6
    assert (v == s).mean() > 0.85  # only quirk positions may differ


def test_sieve_dynamic_matches_reference_python(small_problem):
    hmm, y = small_problem
    K = hmm.K
    b = 5

    sys.path.insert(0, REF_PY)
    try:
        from Viterbi import Sieve
    finally:
        sys.path.remove(REF_PY)

    sv = Sieve(hmm.Pi, hmm.A, hmm.B, np.asarray(y))
    sv.initial_state = None
    idx = np.arange(K)
    sv.viterbi_preprocessing_ancestors_pruning_root(idx, b, K)
    sv.viterbi_preprocessing_descendants_pruning_root(idx, b, K)
    with redirect_stdout(io.StringIO()):
        sv.sieve(idx, hmm.A, hmm.B, np.asarray(y),
                 Pi=np.asarray(hmm.Pi), K=K)
    want = [tuple(int(v) for v in p) for p in sv.path]

    got = sieve_dynamic(hmm.A, hmm.B, hmm.Pi, y, b_hops=b)
    assert got == want
