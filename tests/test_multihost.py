"""2-process DCN-style test: the pipelined shard_map decode over a global
mesh spanning two OS processes (jax.distributed on the CPU backend), the
standard stand-in for a multi-host TPU pod (SURVEY.md §4)."""

import os

from flash_viterbi_tpu.parallel.multihost import launch_workers


def test_two_process_decode(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    launch_workers(worker, 2, tmp_path)


def test_four_process_decode(tmp_path):
    """4 processes x 2 virtual devices: a (4, 2, 1) global mesh whose
    (seq, state) planes are each process-local (asserted in the worker,
    with the DCN-crossing refusal case) — VERDICT r3 item 6."""
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    launch_workers(worker, 4, tmp_path)
