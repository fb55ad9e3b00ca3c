"""Scaling model/virtual sweep and the bf16 approximate mode."""

import numpy as np

import flash_viterbi_tpu as fvt
from flash_viterbi_tpu.parallel.scaling import analyze, measure_virtual


def test_scaling_model_meets_target():
    """Config-5 scale must model >= 80% efficiency on every mesh split."""
    for shape in [(1, 1, 2), (1, 2, 2), (2, 2, 2), (1, 1, 8), (4, 4, 4)]:
        r = analyze(shape, K=16384, T=65536, batch=256)
        assert r.modeled_efficiency >= 0.8, (shape, r.modeled_efficiency)
    # and the report carries the raw byte counts
    r = analyze((1, 1, 2), K=16384, T=65536, batch=256)
    assert r.ici_bytes_state_per_seq > 0
    assert set(r.as_dict()) >= {"modeled_efficiency", "comm_compute_ratio"}


def test_virtual_mesh_sweep_agrees():
    rows = measure_virtual([(1, 1, 1), (2, 2, 2), (1, 2, 4)],
                           K=48, T=32, batch=4)
    assert all(r["paths_equal"] for r in rows)


def test_bf16_mode_quality(small_problem):
    hmm, y = small_problem
    exact = fvt.decode(hmm, y, algorithm="fused", warmup=False, pad_to=1,
                       use_pallas=False)
    approx = fvt.decode(hmm, y, algorithm="fused", warmup=False, pad_to=1,
                        use_pallas=False, precision="bf16")
    with np.errstate(divide="ignore"):
        lA, lB, lPi = (np.log(x) for x in (hmm.A, hmm.B, hmm.Pi))

    def ll(p):
        s = lPi[p[0]] + lB[p[0], y[0]]
        s += sum(lA[p[t - 1], p[t]] + lB[p[t], y[t]] for t in range(1, len(y)))
        return s

    le, la = ll(exact.path), ll(approx.path)
    assert la <= le + 1e-6              # never better than optimal
    assert la >= le - 0.05 * abs(le)    # within 5% relative of optimal
