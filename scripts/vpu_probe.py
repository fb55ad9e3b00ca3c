"""Round-5 probe: empirical v5e VPU peak + config-5 phase-A attribution.

VERDICT r4 weak #2: SCALE.md pinned config-5's phase A at ~2.0e12
VPU-ops/s with no peak denominator, while the b64 batched scan
demonstrates 2.74e12 on the same chip.  This probe:

1. measures the chip's VPU elementwise rate directly (a pure add/max
   loop over VMEM-resident vregs — no HBM, no MXU), giving the roofline
   denominator SCALE.md lacked;
2. times the actual K=16384 / N=16 ``maxplus_scan_deltas`` step and
   ablations of it (no-history-write, no-carry-transpose, wider N) to
   attribute the gap between phase A's rate and the b64 rate.

Timing: marginal-slope chains (bench.py methodology — block_until_ready
does not synchronize through the axon tunnel).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def marginal(f, k1=1, k2=4):
    """Marginal cost per unit via chained dependent calls."""
    sync(f(k1)); sync(f(k2))  # warm BOTH specializations (compile)
    t0 = time.time(); sync(f(k1)); t1 = time.time(); sync(f(k2)); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


# ---------------------------------------------------------------------------
# 1. pure-VPU peak: R repetitions of fused add+max over a VMEM block
# ---------------------------------------------------------------------------

def _vpu_kernel(x_ref, o_ref, *, R: int):
    x = x_ref[:]
    # 4 independent accumulator chains fill the VPU pipeline (a single
    # dependent chain measures latency, not throughput — first attempt
    # read 1.6e12 "peak", below the kernels' own achieved rates)
    ys = [x * c for c in (0.5, 0.25, 0.125, 0.0625)]
    for _ in range(R):
        ys = [jnp.maximum(y + x, y) for y in ys]  # add+max: 2 VPU ops/elem
    o_ref[:] = ys[0] + ys[1] + ys[2] + ys[3]


def vpu_peak(rows=512, cols=512, R=64):
    @functools.partial(jax.jit, static_argnames="k")
    def run(x, k):
        y = x
        for _ in range(k):
            y = pl.pallas_call(
                functools.partial(_vpu_kernel, R=R),
                out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            )(y)
        return y[0, 0]

    x = jnp.asarray(np.random.rand(rows, cols).astype(np.float32))
    per = marginal(lambda k: run(x, k), 16, 128)
    ops = 4 * 2 * R * rows * cols
    # NOTE: unfused elementwise chains round-trip VMEM per op, so this
    # measures the VMEM-bandwidth-bound elementwise rate (~0.6e12 on
    # v5e), NOT the ALU peak.  The architectural VPU peak is
    # 4 ALUs x (8, 128) lanes x ~1.5 GHz (the clock implied by the
    # public 197 bf16 TFLOP/s MXU spec) = ~6.1e12 elem-ops/s — the
    # roofline denominator SCALE.md uses; fused kernels that accumulate
    # in vregs (the scan kernels) can approach it.
    return {"vmem_elementwise_ops_per_s": ops / per, "per_call_s": per,
            "vpu_peak_derived_ops_per_s": 6.1e12}


# ---------------------------------------------------------------------------
# 2. phase-A step cost + ablations at K=16384, N=16
# ---------------------------------------------------------------------------

def _abl_kernel(delta0_ref, logA_ref, emits_ref, dfin_ref, dout_ref,
                dbuf_ref, accv_ref, *, N, BK, BI, write_hist, transpose):
    t = pl.program_id(0)
    it = pl.program_id(1)
    kt = pl.program_id(2)
    KT = pl.num_programs(2)
    cur = t % 2
    nxt = (t + 1) % 2

    @pl.when((t == 0) & (it == 0) & (kt == 0))
    def _():
        dbuf_ref[0, :, :] = delta0_ref[:]

    if write_hist:
        @pl.when(kt == 0)
        def _():
            dout_ref[0, :, :] = dbuf_ref[cur, :, pl.ds(it * BI, BI)]

    tile = logA_ref[:]
    if transpose:
        d_col = jnp.transpose(dbuf_ref[cur, :, pl.ds(kt * BK, BK)])
        cols = [d_col[:, n:n + 1] for n in range(N)]
    else:  # ablation: per-lane broadcast from an untransposed row slice
        d_row = dbuf_ref[cur, :, pl.ds(kt * BK, BK)]  # (N, BK)
        cols = [jnp.full((BK, 1), d_row[n, 0]) for n in range(N)]

    for n in range(N):
        val = jnp.max(cols[n] + tile, axis=0, keepdims=True)

        @pl.when(kt == 0)
        def _():
            accv_ref[n:n + 1, :] = val

        @pl.when(kt > 0)
        def _():
            accv_ref[n:n + 1, :] = jnp.maximum(accv_ref[n:n + 1, :], val)

    @pl.when(kt == KT - 1)
    def _():
        newd = accv_ref[:] + emits_ref[0, :, :]
        dfin_ref[:] = newd
        dbuf_ref[nxt, :, pl.ds(it * BI, BI)] = newd


def ablation(K=16384, N=16, Tm=32, write_hist=True, transpose=True,
             BK=128, BI=8192):
    KT, IT = K // BK, K // BI
    kernel = functools.partial(_abl_kernel, N=N, BK=BK, BI=BI,
                               write_hist=write_hist, transpose=transpose)

    def call(logA, emits, delta0):
        return pl.pallas_call(
            kernel,
            grid=(Tm, IT, KT),
            in_specs=[
                pl.BlockSpec((N, K), lambda t, it, kt: (0, 0)),
                pl.BlockSpec((BK, BI), lambda t, it, kt: (kt, it)),
                pl.BlockSpec((1, N, BI), lambda t, it, kt: (t, 0, it)),
            ],
            out_specs=[
                pl.BlockSpec((N, BI), lambda t, it, kt: (0, it)),
                pl.BlockSpec((1, N, BI), lambda t, it, kt: (t, 0, it)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, K), jnp.float32),
                jax.ShapeDtypeStruct((Tm, N, K), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, N, K), jnp.float32),
                pltpu.VMEM((N, BI), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Tm * N * K * K,
                bytes_accessed=Tm * K * K * 4 + Tm * N * K * 8,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(delta0, logA, emits)

    @functools.partial(jax.jit, static_argnames="k")
    def chain(logA, emits, delta0, k):
        d = delta0
        for _ in range(k):
            dfin, _ = call(logA, emits, d)
            d = jnp.where(dfin[:, :1] > -1e30, delta0, dfin * 0)
        return d[0, 0]

    rng = np.random.default_rng(0)
    logA = jnp.asarray(rng.standard_normal((K, K)).astype(np.float32))
    emits = jnp.asarray(rng.standard_normal((Tm, N, K)).astype(np.float32))
    d0 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32))
    per = marginal(lambda k: chain(logA, emits, d0, k), 1, 3)
    per_step = per / Tm
    return {"K": K, "N": N, "BK": BK, "BI": BI, "write_hist": write_hist,
            "transpose": transpose, "per_step_s": per_step,
            "counted_vpu_ops_per_s": 2 * N * K * K / per_step,
            "logA_stream_s": K * K * 4 / 819e9}


def main():
    out = {}
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for name, fn in [
        ("vpu_peak", vpu_peak),
        ("phaseA_baseline", lambda: ablation()),
        ("phaseA_no_hist", lambda: ablation(write_hist=False)),
        ("phaseA_no_transpose", lambda: ablation(transpose=False)),
        ("phaseA_N32", lambda: ablation(N=32, Tm=16)),
        ("phaseA_BK256", lambda: ablation(BK=256, BI=4096)),
        ("phaseA_BK512_BI2048", lambda: ablation(BK=512, BI=2048)),
        ("phaseA_BK512_BI4096", lambda: ablation(BK=512, BI=4096)),
        ("phaseA_BK1024_BI2048", lambda: ablation(BK=1024, BI=2048)),
        ("phaseA_BK256_BI8192", lambda: ablation(BK=256, BI=8192)),
        ("b64_shape_K4096", lambda: ablation(K=4096, N=64, Tm=64,
                                             BK=256, BI=4096)),
        ("b64_K4096_BK512", lambda: ablation(K=4096, N=64, Tm=64,
                                             BK=512, BI=2048)),
    ]:
        try:
            t0 = time.time()
            out[name] = fn()
            out[name]["elapsed_s"] = round(time.time() - t0, 1)
            print(json.dumps({name: out[name]}), flush=True)
        except Exception as e:
            print(json.dumps({name: f"FAIL {type(e).__name__}: {e}"}),
                  flush=True)
    with open(os.path.join(os.path.dirname(__file__), os.pardir, "results",
                           "vpu_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
