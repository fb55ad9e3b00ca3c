"""Measured reference-side timings for the sieve family on shared fixtures.

VERDICT r3 item 3: every "matches or beats the reference" claim needs a
same-fixture reference timing next to it.  This script times, in-process,
the ORIGINAL reference Python classes (`Viterbi.py::Sieve.sieve` /
`.sieve_dag`, `sieve_beam_search.py::SIEVE_BEAMSEARCH.viterbi_space_efficient`
/ `.viterbi_middlepath` / `.beam_search`) and, where compilable, the
reference C binaries (via tests/ref_compile.py) on the exact fixtures the
framework's SCALE.md rows use — then (with --fvt) the framework decoders
on the same fixtures.

Usage:
  python scripts/ref_timings.py --ref          # CPU-only reference side
  python scripts/ref_timings.py --fvt          # framework side (uses TPU)
Results merge into results/ref_timings.json; print_table() renders the
SCALE.md comparison block.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
REF_PY = "/root/reference/Base_line/Python implementations"
OUT = os.path.join(ROOT, "results", "ref_timings.json")

# Shared fixtures: (key, K, M, T, prob, seed, beam).  These match the
# SCALE.md sieve-family rows (K=512/T=128 sieve_dynamic, K=256/T=64
# sieve_dag) plus a K=256 fixture where every reference variant is
# feasible (the reference SIEVE-BS preprocessing materializes M*K^2
# dict entries — K=512 costs minutes, K=3965 is infeasible, README-level
# fact mirrored in cli.py compare's --oracle-limit guard).
FIXTURES = {
    "dyn512": dict(K=512, M=50, T=128, prob=0.112, seed=7, beam=32),
    "dag256": dict(K=256, M=16, T=64, seed=5, beam=16, dag=True),
    "bs256": dict(K=256, M=50, T=128, prob=0.169, seed=11, beam=32),
    "bs512": dict(K=512, M=50, T=256, prob=0.112, seed=3, beam=32),
}


def _load(path=OUT):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save(data, path=OUT):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


def _fixture(name):
    from flash_viterbi_tpu.models.generate import make_dag_hmm, make_sparse_hmm

    cfg = dict(FIXTURES[name])
    beam = cfg.pop("beam")
    if cfg.pop("dag", False):
        hmm, y = make_dag_hmm(**cfg, sanitize=True)
    else:
        hmm, y = make_sparse_hmm(**cfg)
    return hmm, np.asarray(y), beam


def _ref_sieve(hmm, y, dag: bool):
    """Time the reference Sieve.sieve / sieve_dag (decode only, like the
    reference Baseline.py: preprocessing timed separately)."""
    sys.path.insert(0, REF_PY)
    try:
        from Viterbi import Sieve
    finally:
        sys.path.remove(REF_PY)
    K = hmm.K
    idx = np.arange(K)
    sv = Sieve(np.asarray(hmm.Pi), hmm.A, hmm.B, y)
    sv.initial_state = None
    t0 = time.time()
    with np.errstate(divide="ignore", invalid="ignore"):
        if dag:
            with redirect_stdout(io.StringIO()):
                sv.sieve_dag(idx, hmm.A, hmm.B, y,
                             Pi=np.asarray(hmm.Pi), K=K)
            pre = 0.0
        else:
            sv.viterbi_preprocessing_ancestors_pruning_root(idx, 5, K)
            sv.viterbi_preprocessing_descendants_pruning_root(idx, 5, K)
            pre = time.time() - t0
            t0 = time.time()
            with redirect_stdout(io.StringIO()):
                sv.sieve(idx, hmm.A, hmm.B, y, Pi=np.asarray(hmm.Pi), K=K)
    dt = time.time() - t0
    return dt, pre, [tuple(int(v) for v in p) for p in sv.path]


def _ref_sieve_bs(hmm, y, beam, method):
    """Time SIEVE_BEAMSEARCH.{viterbi_space_efficient,viterbi_middlepath}
    including its required per-decode preprocessing split out."""
    from flash_viterbi_tpu.oracle.sieve_bs import build_adjacency

    sys.path.insert(0, REF_PY)
    try:
        from sieve_beam_search import SIEVE_BEAMSEARCH
    finally:
        sys.path.remove(REF_PY)
    K = hmm.K
    idx = list(range(K))
    t0 = time.time()
    pi, A_out, A_in, ac = build_adjacency(hmm.A, hmm.B, lazy=False)
    bs = SIEVE_BEAMSEARCH(pi, A_out, A_in, ac, beam)
    bs.viterbi_preprocessing_descendants_pruning_root(idx, len(y), K)
    bs.viterbi_preprocessing_ancestors_pruning_root(idx, len(y), K)
    pre = time.time() - t0
    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        getattr(bs, method)(idx, frames=list(y), Pi=pi, K=K)
    dt = time.time() - t0
    return dt, pre, [tuple(int(v) for v in p) for p in bs.path]


def run_ref(keys=None):
    data = _load()
    jobs = [
        ("sieve_dynamic", "dyn512", lambda h, y, b: _ref_sieve(h, y, False)),
        ("sieve_dag", "dag256", lambda h, y, b: _ref_sieve(h, y, True)),
        ("sieve_bs", "bs256",
         lambda h, y, b: _ref_sieve_bs(h, y, b, "viterbi_space_efficient")),
        ("sieve_bs_mp", "bs256",
         lambda h, y, b: _ref_sieve_bs(h, y, b, "viterbi_middlepath")),
        ("sieve_bs", "bs512",
         lambda h, y, b: _ref_sieve_bs(h, y, b, "viterbi_space_efficient")),
        ("sieve_bs_mp", "bs512",
         lambda h, y, b: _ref_sieve_bs(h, y, b, "viterbi_middlepath")),
    ]
    for alg, fx, fn in jobs:
        if keys and fx not in keys:
            continue
        hmm, y, beam = _fixture(fx)
        print(f"[ref] {alg} on {fx} ...", flush=True)
        dt, pre, path = fn(hmm, y, beam)
        row = data.setdefault(f"{alg}@{fx}", {})
        row["ref_python_s"] = round(dt, 4)
        row["ref_python_pre_s"] = round(pre, 4)
        row["ref_path_len"] = len(path)
        print(f"[ref] {alg}@{fx}: decode {dt:.3f}s (pre {pre:.3f}s)",
              flush=True)
        _save(data)
    return data


def run_ref_c(keys=None):
    """Reference C binaries (SIEVE-Mp; SIEVE-BS/-Mp via the glib shim) on
    the same fixtures, through tests/ref_compile.py."""
    import tempfile

    from flash_viterbi_tpu.utils.io import save_dataset
    sys.path.insert(0, ROOT)
    from tests.ref_compile import build_and_run_timed  # noqa: E402

    data = _load()
    jobs = [("sieve_mp", "dyn512"), ("sieve_bs", "bs256"),
            ("sieve_bs_mp", "bs256"), ("sieve_bs", "bs512"),
            ("sieve_bs_mp", "bs512")]
    for alg, fx in jobs:
        if keys and fx not in keys:
            continue
        hmm, y, beam = _fixture(fx)
        cfg = FIXTURES[fx]
        with tempfile.TemporaryDirectory() as td:
            data_dir = td + "/data/"
            os.makedirs(data_dir)
            save_dataset(data_dir, hmm, y, T=cfg["T"],
                         prob=cfg.get("prob", 0.9))
            try:
                t = build_and_run_timed(alg, td, cfg["K"], cfg["M"],
                                        cfg["T"], cfg.get("prob", 0.9),
                                        data_dir, beam=beam)
            except Exception as e:  # segfault/compile gap: record honestly
                t = None
                print(f"[refC] {alg}@{fx}: FAILED ({e})", flush=True)
            row = data.setdefault(f"{alg}@{fx}", {})
            row["ref_c_s"] = round(t, 4) if t is not None else None
            if t is not None:
                print(f"[refC] {alg}@{fx}: {t:.3f}s", flush=True)
        _save(data)
    return data


def run_fvt(keys=None):
    """Framework decoders on the same fixtures (device path)."""
    import flash_viterbi_tpu as fvt

    data = _load()
    jobs = [
        ("sieve_dynamic", "dyn512", "sieve", {}),
        ("sieve_dag", "dag256", "sieve_dag", {}),
        ("sieve_mp", "dyn512", "sieve_mp", {}),
        ("sieve_bs", "bs256", "sieve_bs", {}),
        ("sieve_bs_mp", "bs256", "sieve_bs_mp", {}),
        ("sieve_bs", "bs512", "sieve_bs", {}),
        ("sieve_bs_mp", "bs512", "sieve_bs_mp", {}),
    ]
    for alg, fx, fvt_name, kw in jobs:
        if keys and fx not in keys:
            continue
        hmm, y, beam = _fixture(fx)
        if "bs" in fvt_name or fvt_name == "sieve_bs":
            kw = dict(kw, beam_width=beam)
        print(f"[fvt] {fvt_name} on {fx} ...", flush=True)
        r = fvt.decode(hmm, y, algorithm=fvt_name, **kw)  # warm/compile
        r = fvt.decode(hmm, y, algorithm=fvt_name, **kw)
        row = data.setdefault(f"{alg}@{fx}", {})
        row["fvt_s"] = round(r.time_s, 4)
        row["fvt_algorithm"] = fvt_name
        print(f"[fvt] {alg}@{fx}: {r.time_s:.3f}s", flush=True)
        _save(data)
    return data


def print_table():
    data = _load()
    print(f"{'row':24s} {'ref_py_s':>9s} {'ref_c_s':>8s} {'fvt_s':>8s} "
          f"{'vs_py':>7s} {'vs_c':>7s}")
    for key in sorted(data):
        r = data[key]
        py, c, f = (r.get("ref_python_s"), r.get("ref_c_s"), r.get("fvt_s"))
        vs_py = f"{py / f:.1f}x" if py and f else "-"
        vs_c = f"{c / f:.1f}x" if c and f else "-"
        print(f"{key:24s} {py if py is not None else '-':>9} "
              f"{c if c is not None else '-':>8} "
              f"{f if f is not None else '-':>8} {vs_py:>7s} {vs_c:>7s}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--ref-c", action="store_true")
    ap.add_argument("--fvt", action="store_true")
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--fixtures", default=None,
                    help="comma-separated fixture keys to run")
    a = ap.parse_args()
    keys = a.fixtures.split(",") if a.fixtures else None
    if not a.fvt:
        # reference-side runs are host-only: pin CPU so this process never
        # contends for the single TPU (the axon plugin wins over env vars;
        # must be pinned via jax.config after import — see verify skill)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if a.ref:
        run_ref(keys)
    if a.ref_c:
        run_ref_c(keys)
    if a.fvt:
        run_fvt(keys)
    if a.table or not (a.ref or a.ref_c or a.fvt):
        print_table()
