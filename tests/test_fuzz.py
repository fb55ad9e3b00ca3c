"""Randomized cross-algorithm property test: on any seeded problem, every
exact algorithm must produce the identical path (the framework's central
invariant — same numerics contract, same tie-breaking)."""

import numpy as np
import pytest

import flash_viterbi_tpu as fvt
from flash_viterbi_tpu.oracle import framework as ofw

CASES = [
    # (K, M, T, prob, seed)
    (24, 3, 9, 0.6, 101),
    (40, 7, 21, 0.35, 102),
    (56, 11, 40, 0.2, 103),
    (72, 5, 13, 0.45, 104),
    (96, 16, 57, 0.15, 105),
    (33, 4, 26, 0.5, 106),   # K not a multiple of 8
    (128, 9, 31, 0.1, 107),
    (17, 2, 64, 0.7, 108),
]


@pytest.mark.parametrize("K,M,T,prob,seed", CASES)
def test_exact_algorithms_agree(K, M, T, prob, seed):
    hmm, y = fvt.make_sparse_hmm(K=K, M=M, T=T, prob=prob, seed=seed)
    want = ofw.vanilla(hmm.A, hmm.B, hmm.Pi, y)
    for alg, kw in [
        ("vanilla", {}),
        ("checkpoint", {}),
        ("checkpoint", {"use_pallas": True}),
        ("fused", {}),
        ("fused", {"use_pallas": True}),
        ("flash", {"num_segments": 5}),
        ("flash", {"num_segments": 5, "mode": "lean"}),
        ("flash", {"num_segments": 5, "mode": "lean", "lean_leaf": 0}),
        ("flash", {"num_segments": 3, "mode": "lean", "lean_leaf": 4}),
        ("flash_bs", {"beam_width": K, "num_segments": 5}),
        ("beam", {"beam_width": K}),
    ]:
        r = fvt.decode(hmm, y, algorithm=alg, pad_to=1, warmup=False, **kw)
        np.testing.assert_array_equal(r.path, want,
                                      err_msg=f"{alg} {kw} K={K} T={T}")
