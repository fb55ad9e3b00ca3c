"""Test configuration: force CPU with 8 virtual devices so sharding paths
(`shard_map` over a Mesh) run in CI without TPU hardware (SURVEY.md §4).

A separate hardware tier runs on the real chip:
``FVT_TPU_TESTS=1 pytest -m tpu tests/`` keeps the TPU backend and runs
only the @pytest.mark.tpu tests (kernel-on-hardware parity — the class of
thing that drifts between the Pallas interpreter and real Mosaic).
"""

import os

_TPU_TIER = os.environ.get("FVT_TPU_TESTS", "") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_TIER and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin registers itself from sitecustomize.py (before conftest
# runs) whenever PALLAS_AXON_POOL_IPS is set, and wins over the JAX_PLATFORMS
# env var; only a config update after import reliably pins tests to the
# virtual-device CPU backend.
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: hardware-tier test (FVT_TPU_TESTS=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(reason="TPU tier: set FVT_TPU_TESTS=1 and run -m tpu")
    skip_cpu = pytest.mark.skip(reason="CPU-tier test (TPU tier active)")
    for item in items:
        is_tpu = "tpu" in item.keywords
        if is_tpu and not _TPU_TIER:
            item.add_marker(skip_tpu)
        if not is_tpu and _TPU_TIER:
            item.add_marker(skip_cpu)

from flash_viterbi_tpu.models.generate import make_sparse_hmm


@pytest.fixture(scope="session")
def small_problem():
    """K=64, T=32 sparse HMM — small enough for exhaustive parity checks."""
    hmm, y = make_sparse_hmm(K=64, M=12, T=32, prob=0.3, seed=7)
    return hmm, y


@pytest.fixture(scope="session")
def medium_problem():
    hmm, y = make_sparse_hmm(K=128, M=20, T=64, prob=0.2, seed=3)
    return hmm, y
