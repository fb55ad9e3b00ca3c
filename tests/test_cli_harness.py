"""CLI + benchmark harness: generate/decode round-trip via the reference
stdout protocol, and harness rows with the run.py CSV schema."""

import io
import re
from contextlib import redirect_stdout

import numpy as np

from flash_viterbi_tpu.bench.harness import CSV_FIELDS, RunConfig, append_csv, run_one
from flash_viterbi_tpu.cli import main
from flash_viterbi_tpu.oracle import framework as ofw
from flash_viterbi_tpu.utils.io import load_dataset


def test_cli_generate_decode_roundtrip(tmp_path):
    data = str(tmp_path / "data")
    assert main(["generate", "-K", "48", "-M", "8", "-T", "24", "-p", "0.3",
                 "-s", "5", "-o", data]) == 0

    hmm, y = load_dataset(data, 48, 24, 8, prob=0.3)
    want = ofw.vanilla(hmm.A, hmm.B, hmm.Pi, y)

    out = io.StringIO()
    with redirect_stdout(out):
        rc = main(["decode", "-a", "vanilla", "-K", "48", "-M", "8", "-T", "24",
                   "-p", "0.3", "--data", data])
    assert rc == 0
    text = out.getvalue()
    assert text.startswith("time: ")
    m = re.search(r"path: \[([^\]]*)\]", text)
    got = np.array([int(x) for x in m.group(1).split()])
    np.testing.assert_array_equal(got, want)
    assert re.search(r"memory: \d+", text)


def test_harness_row_schema(tmp_path):
    cfg = RunConfig(algorithm="vanilla", K=48, M=8, T=24, prob=0.3, seed=5)
    row = run_one(cfg)
    assert set(row) == set(CSV_FIELDS)
    assert row["parity"] is True
    assert row["updates_per_s"] > 0
    p = append_csv(row, str(tmp_path), "vanilla")
    header = open(p).readline().strip().split(",")
    assert header == CSV_FIELDS
