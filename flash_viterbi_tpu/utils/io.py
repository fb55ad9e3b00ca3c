"""Model I/O: the reference's text file format and filename scheme.

File naming (reference ``README.md:107-114``, ``data_script.py:98-101``)::

    {data_path}/{A,B,Pi,ob}_K{K}_T{T}_prob{p}.txt      (sparse-graph HMMs)
    {data_path}/{A,B,Pi,ob}_K{K}_T{T}_DAG.txt          (DAG HMMs)

where ``T`` in the *filename* is the observation sequence length
(``obserRouteLEN``) — not ``T_STATE`` (= M, the observation alphabet size);
see the standing naming confusion at ``README.md:129-131``.

Files are whitespace-separated text: ``A``/``B`` one matrix row per line
(``%.16f``), ``Pi`` and ``ob`` single-line space-separated.  The C loaders
(``src/FLASH_Viterbi_multithread.c:56-95``) fscanf floats into fp32, so we
load as float64 text and keep float64 here; truncation to fp32 happens in
``LogHMM`` exactly once (vs. the C structs which store fp32 probabilities and
take float64 logs of them — for bit parity with C, quantize with
``as_float32=True``).

A native C++ fast parser (``csrc/fastio.cpp``) is used when built; the numpy
fallback is always available.
"""

from __future__ import annotations

import os

import numpy as np

from ..models.hmm import HMM


def prob_str(prob: float, decimals: int | None = None) -> str:
    """Format ``prob`` the way run.py patches it (``src/run.py:39-47``):
    the number of decimals in the Python literal is used verbatim."""
    if decimals is None:
        s = repr(float(prob))
        decimals = len(s.split(".")[1]) if "." in s else 0
    return f"{prob:.{decimals}f}"


def dataset_paths(data_path: str, K: int, T: int, prob: float | None = None,
                  dag: bool = False, prob_decimals: int | None = None) -> dict:
    tag = "DAG" if dag else f"prob{prob_str(prob, prob_decimals)}"
    return {
        name: os.path.join(data_path, f"{name}_K{K}_T{T}_{tag}.txt")
        for name in ("A", "B", "Pi", "ob")
    }


def save_dataset(data_path: str, hmm: HMM, y: np.ndarray, T: int | None = None,
                 prob: float | None = None, dag: bool = False,
                 prob_decimals: int | None = None) -> dict:
    """Write the four text files exactly as the reference generator does
    (``data_script.py:98-101``: ``%.16f`` matrices, ``%d`` observations,
    single-line Pi/ob with trailing separator)."""
    os.makedirs(data_path, exist_ok=True)
    T = int(len(y) if T is None else T)
    paths = dataset_paths(data_path, hmm.K, T, prob, dag, prob_decimals)

    def _save_matrix(path, mat):
        try:
            from ..runtime.native import save_floats_native

            if save_floats_native(path, mat):  # same %.16f format, ~10x faster
                return
        except Exception:
            pass
        np.savetxt(path, mat, fmt="%.16f")

    _save_matrix(paths["A"], hmm.A)
    _save_matrix(paths["B"], hmm.B)
    np.savetxt(paths["Pi"], hmm.Pi, fmt="%.16f", newline=" ")
    np.savetxt(paths["ob"], np.asarray(y, dtype=np.int64), fmt="%d", newline=" ")
    return paths


def _load_text_floats(path: str, count: int) -> np.ndarray:
    try:
        from ..runtime.native import load_floats_native

        out = load_floats_native(path, count)
        if out is not None:
            return out
    except Exception:
        pass
    # np.fromfile(sep=" ") chokes on the reference DAG generator's overflowed
    # 1.8e308 tokens (its axis-bug normalization, data_script_dag.py:54);
    # split-parse is robust to them.
    with open(path) as f:
        toks = f.read().split()
    return np.array(toks[:count], dtype=np.float64)


def load_dataset(data_path: str, K: int, T: int, M: int,
                 prob: float | None = None, dag: bool = False,
                 prob_decimals: int | None = None,
                 as_float32: bool = False) -> tuple[HMM, np.ndarray]:
    """Load ``(HMM, observations)`` from the reference text format.

    ``as_float32`` quantizes probabilities to fp32 on load, matching the C
    structs' storage (``src/FLASH_Viterbi_multithread.c:25-34``) so log-domain
    values agree bit-for-bit with the reference binaries.
    """
    paths = dataset_paths(data_path, K, T, prob, dag, prob_decimals)
    A = _load_text_floats(paths["A"], K * K).reshape(K, K)
    B = _load_text_floats(paths["B"], K * M).reshape(K, M)
    Pi = _load_text_floats(paths["Pi"], K)
    try:
        from ..runtime.native import load_ints_native

        yi = load_ints_native(paths["ob"], T)
    except Exception:
        yi = None
    if yi is None:
        yi = np.fromfile(paths["ob"], dtype=np.int64, count=T, sep=" ")
    y = yi.astype(np.int32)
    if as_float32:
        A = A.astype(np.float32).astype(np.float64)
        B = B.astype(np.float32).astype(np.float64)
        Pi = Pi.astype(np.float32).astype(np.float64)
    return HMM(A=A, B=B, Pi=Pi), y
