"""Data generation + I/O: our generators must be bit-identical to the
reference scripts for a given seed, and save/load must round-trip."""

import os
import subprocess
import sys

import numpy as np
import pytest

from flash_viterbi_tpu.models.generate import make_dag_hmm, make_sparse_hmm
from flash_viterbi_tpu.utils.io import dataset_paths, load_dataset, prob_str, save_dataset

REF_GEN = "/root/reference/generate_data/data_script.py"


def test_prob_str_matches_runpy_patch():
    # run.py patches the filename precision to the literal's decimals
    # (src/run.py:39-47)
    assert prob_str(0.3) == "0.3"
    assert prob_str(0.112) == "0.112"
    assert prob_str(0.25) == "0.25"


def test_roundtrip(tmp_path, small_problem):
    hmm, y = small_problem
    save_dataset(str(tmp_path), hmm, y, prob=0.3)
    h2, y2 = load_dataset(str(tmp_path), K=hmm.K, T=len(y), M=hmm.M, prob=0.3)
    np.testing.assert_allclose(h2.A, hmm.A, atol=5e-17)
    np.testing.assert_allclose(h2.B, hmm.B, atol=5e-17)
    np.testing.assert_array_equal(y2, y)


def test_filenames_match_reference_scheme(tmp_path):
    paths = dataset_paths(str(tmp_path), K=64, T=32, prob=0.3)
    assert paths["A"].endswith("A_K64_T32_prob0.3.txt")
    paths = dataset_paths(str(tmp_path), K=64, T=32, dag=True)
    assert paths["ob"].endswith("ob_K64_T32_DAG.txt")


@pytest.mark.skipif(not os.path.exists(REF_GEN), reason="reference not mounted")
def test_generator_bit_identical_to_reference_script(tmp_path):
    """Run the reference generator script and diff its files against ours."""
    K, M, T, prob, seed = 32, 8, 16, 0.4, 5
    subprocess.run(
        [sys.executable, REF_GEN, "-s", str(seed), "-n", str(M), "-K", str(K),
         "-T", str(T), "-b", "4", "-p", str(prob)],
        cwd=tmp_path, check=True, capture_output=True,
    )
    ours = tmp_path / "ours"
    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=prob, seed=seed)
    save_dataset(str(ours), hmm, y, prob=prob)
    for name in ("A", "B", "Pi"):
        ref = (tmp_path / f"{name}_K{K}_T{T}_prob{prob}.txt").read_text()
        got = (ours / f"{name}_K{K}_T{T}_prob{prob}.txt").read_text()
        assert got == ref, f"{name} file differs from reference generator"
    # the reference script samples observations from uninitialized global
    # random state (data_script.py:86 — no random.seed call), so the ob file
    # is not reproducible; we seed it, and only check format compatibility.
    ref_ob = (tmp_path / f"ob_K{K}_T{T}_prob{prob}.txt").read_text().split()
    got_ob = (ours / f"ob_K{K}_T{T}_prob{prob}.txt").read_text().split()
    assert len(ref_ob) == len(got_ob) == T


def test_dag_generator(tmp_path):
    # faithful mode reproduces the reference's normalization-broadcast bug
    # (overflowed entries in the sink column) and must still round-trip
    hmm, y = make_dag_hmm(K=16, M=6, T=12, seed=3)
    assert hmm.A.shape == (16, 16)
    save_dataset(str(tmp_path), hmm, y, dag=True)
    h2, y2 = load_dataset(str(tmp_path), K=16, T=12, M=6, dag=True)
    assert h2.A.shape == hmm.A.shape
    # sanitized mode yields a proper row-stochastic (or zero-row) matrix
    hmm_s, _ = make_dag_hmm(K=16, M=6, T=12, seed=3, sanitize=True)
    assert np.isfinite(hmm_s.A).all()
    rs = hmm_s.A.sum(axis=1)
    assert ((np.abs(rs - 1) < 1e-9) | (rs == 0)).all()


def test_native_oracle_matches_numpy_mirror():
    """The C fast oracle must be bit-identical to the numpy framework
    mirror (same fp32 contract, same lowest-index ties)."""
    import numpy as np

    from flash_viterbi_tpu.models.generate import make_sparse_hmm
    from flash_viterbi_tpu.oracle import framework as ofw
    from flash_viterbi_tpu.oracle import native as onat

    for (K, M, T, prob, seed) in [(64, 12, 32, 0.3, 7), (33, 4, 26, 0.5, 106)]:
        hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=prob, seed=seed)
        a = ofw.vanilla(hmm.A, hmm.B, hmm.Pi, y)
        b = onat.vanilla(hmm.A, hmm.B, hmm.Pi, y)
        np.testing.assert_array_equal(a, b)
