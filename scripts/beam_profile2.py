"""Stage-2 micro-profile: where do the pick loop's ~560 ns/iteration go?

Variants of the top-B extraction, measured as full 255-step kernels
(fold+DMA included, ~3 us/step baseline from beam_profile.py):

  prod      — production pick: 3 full (S,128) reductions + 2 SMEM stores
  packed    — slot folded into the index reduction (code = idx*256+slot):
              2 full reductions
  nosmem    — packed, and no SMEM stores in the loop (states written once
              after; breaks DMA chaining so states are fed from step t-1's
              sv vector via VMEM — semantics preserved for profiling only)
  onereduce — single reduction per iteration (max only; idx=iteration —
              WRONG results, pure cost attribution)
  blockm    — packed + the max computed on an (8,128) elementwise-folded
              block-max view (smaller reduce tree for m)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float("-inf")


def make_kernel(B, K, mode):
    S = K // 128

    def kern(vals0_ref, states0_ref, emits_ref, logA_hbm, hist_ref,
             vals_s, states_s, rows_buf, sems):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            def cp(b, c):
                states_s[0, b] = states0_ref[0, b]
                vals_s[0, b] = vals0_ref[0, b]
                return c
            jax.lax.fori_loop(0, B, cp, 0)

        def issue(b, c):
            pltpu.make_async_copy(logA_hbm.at[states_s[0, b]],
                                  rows_buf.at[b], sems.at[b]).start()
            return c
        jax.lax.fori_loop(0, B, issue, 0)

        iota_g = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
                  + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))

        def fold(b, carry):
            maxv, slot = carry
            pltpu.make_async_copy(logA_hbm.at[states_s[0, b]],
                                  rows_buf.at[b], sems.at[b]).wait()
            cand = rows_buf[pl.ds(b, 1)][0] + vals_s[0, b]
            upd = (cand > maxv) | ((cand == maxv) & (slot == B))
            return jnp.where(upd, cand, maxv), jnp.where(upd, b, slot)
        maxv, slot = jax.lax.fori_loop(
            0, B, fold,
            (jnp.full((S, 128), NEG, jnp.float32),
             jnp.full((S, 128), B, jnp.int32)))
        full = maxv + emits_ref[0]
        code = iota_g * 256 + slot  # packed (index, slot)
        iotaB1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        BIG = jnp.int32(2**30)

        if mode == "prod":
            def pick(b, carry):
                taken, sv = carry
                free = taken == 0
                masked = jnp.where(free, full, NEG)
                m = jnp.max(masked)
                idx = jnp.min(jnp.where((masked == m) & free, iota_g, K))
                taken = jnp.where(iota_g == idx, 1, taken)
                states_s[0, b] = idx
                vals_s[0, b] = m
                sb = jnp.min(jnp.where(iota_g == idx, slot, B))
                sv = jnp.where(iotaB1 == b, idx * 256 + sb, sv)
                return taken, sv
        elif mode in ("packed", "nosmem"):
            def pick(b, carry):
                taken, sv = carry
                free = taken == 0
                masked = jnp.where(free, full, NEG)
                m = jnp.max(masked)
                c = jnp.min(jnp.where((masked == m) & free, code, BIG))
                idx = c // 256
                taken = jnp.where(iota_g == idx, 1, taken)
                if mode == "packed":
                    states_s[0, b] = idx
                    vals_s[0, b] = m
                sv = jnp.where(iotaB1 == b, c, sv)
                return taken, sv
        elif mode == "onereduce":
            def pick(b, carry):
                taken, sv = carry
                free = taken == 0
                masked = jnp.where(free, full, NEG)
                m = jnp.max(masked)
                idx = b  # WRONG on purpose: cost attribution only
                taken = jnp.where(iota_g == idx, 1, taken)
                states_s[0, b] = idx
                vals_s[0, b] = m
                sv = jnp.where(iotaB1 == b, idx, sv)
                return taken, sv
        elif mode == "blockm":
            def pick(b, carry):
                taken, sv = carry
                free = taken == 0
                masked = jnp.where(free, full, NEG)
                bm = masked[0:8]
                for blk in range(1, S // 8):
                    bm = jnp.maximum(bm, masked[8 * blk:8 * (blk + 1)])
                m = jnp.max(bm)
                c = jnp.min(jnp.where((masked == m) & free, code, BIG))
                idx = c // 256
                taken = jnp.where(iota_g == idx, 1, taken)
                states_s[0, b] = idx
                vals_s[0, b] = m
                sv = jnp.where(iotaB1 == b, c, sv)
                return taken, sv
        else:
            raise ValueError(mode)

        _, sv = jax.lax.fori_loop(
            0, B, pick, (jnp.zeros((S, 128), jnp.int32),
                         jnp.zeros((1, B), jnp.int32)))
        if mode == "nosmem":
            m = jnp.max(full)

            def st(b, c):
                states_s[0, b] = states0_ref[0, b]
                vals_s[0, b] = m
                return c
            jax.lax.fori_loop(0, B, st, 0)
        hist_ref[0] = sv

    return kern


def run_variant(name, B, K, Tm):
    from flash_viterbi_tpu.bench.harness import marginal_time

    S = K // 128
    rng = np.random.default_rng(0)
    logA = jnp.asarray(rng.standard_normal((K, S, 128)), jnp.float32)
    emits = jnp.asarray(rng.standard_normal((Tm, S, 128)), jnp.float32)
    vals0 = jnp.asarray(np.sort(rng.standard_normal(B))[::-1].copy(),
                        jnp.float32)
    states0 = jnp.arange(B, dtype=jnp.int32)
    kern = make_kernel(B, K, name)

    def call(v0, e):
        return pl.pallas_call(
            kern, grid=(Tm,),
            in_specs=[
                pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, S, 128), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tm, 1, B), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((1, B), jnp.float32),
                pltpu.SMEM((1, B), jnp.int32),
                pltpu.VMEM((B, S, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((B,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Tm * B * K,
                bytes_accessed=Tm * (B * K * 4 + K * 4),
                transcendentals=0),
        )(v0[None], states0[None], e, logA)

    @functools.partial(jax.jit, static_argnames="k")
    def chained(v0, e, k):
        h = None
        for _ in range(k):
            h = call(v0, e)
            v0 = v0 + h[0, 0, :].astype(jnp.float32) * jnp.float32(1e-30)
        return h

    per = marginal_time(lambda k: (lambda: chained(vals0, emits, k=k)))
    print(f"{name:12s} per-call {per*1e3:8.3f} ms  per-step {per/Tm*1e6:7.2f} us",
          flush=True)
    return per


if __name__ == "__main__":
    B, K, Tm = 64, 4096, 255
    for mode in (sys.argv[1:] or ["prod", "packed", "nosmem", "onereduce",
                                  "blockm"]):
        run_variant(mode, B, K, Tm)
