"""Micro-profile of the beam kernel's per-step cost centers on the chip.

Variants (same grid/DMA structure, parts disabled) isolate where the
~43 us/step goes: DMA fetch, the fold (max over beam slots), or the
top-B pick loop.  Methodology: static-k chained dispatch slope, like
bench.py (sync floor ~25 ms on the tunnel).
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


def make_kernel(B, K, Tm, do_dma, do_fold, do_pick):
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

        if do_dma:
            def issue(b, c):
                pltpu.make_async_copy(logA_hbm.at[states_s[0, b]],
                                      rows_buf.at[b], sems.at[b]).start()
                return c
            jax.lax.fori_loop(0, B, issue, 0)

        iota_g = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
                  + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))

        if do_fold:
            def fold(b, carry):
                maxv, slot = carry
                if do_dma:
                    pltpu.make_async_copy(logA_hbm.at[states_s[0, b]],
                                          rows_buf.at[b], sems.at[b]).wait()
                cand = rows_buf[pl.ds(b, 1)][0] + vals_s[0, b]
                upd = (cand > maxv) | ((cand == maxv) & (slot == B))
                return jnp.where(upd, cand, maxv), jnp.where(upd, b, slot)
            maxv, slot = jax.lax.fori_loop(
                0, B, fold,
                (jnp.full((S, 128), NEG, jnp.float32),
                 jnp.full((S, 128), B, jnp.int32)))
        else:
            if do_dma:
                def wt(b, c):
                    pltpu.make_async_copy(logA_hbm.at[states_s[0, b]],
                                          rows_buf.at[b], sems.at[b]).wait()
                    return c
                jax.lax.fori_loop(0, B, wt, 0)
            maxv = rows_buf[pl.ds(0, 1)][0] + emits_ref[0]
            slot = jnp.zeros((S, 128), jnp.int32)
        full = maxv + emits_ref[0]

        iotaB1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        if do_pick:
            def pick(b, carry):
                taken, sv = carry
                free = taken == 0
                masked = jnp.where(free, full, NEG)
                m = jnp.max(masked)
                cand = jnp.where((masked == m) & free, iota_g, K)
                idx = jnp.min(cand)
                taken = jnp.where(iota_g == idx, 1, taken)
                states_s[0, b] = idx
                vals_s[0, b] = m
                sb = jnp.min(jnp.where(iota_g == idx, slot, B))
                sv = jnp.where(iotaB1 == b, idx * 256 + sb, sv)
                return taken, sv
            _, sv = jax.lax.fori_loop(
                0, B, pick, (jnp.zeros((S, 128), jnp.int32),
                             jnp.zeros((1, B), jnp.int32)))
        else:
            sv = jnp.broadcast_to(jnp.int32(0), (1, B)) + iotaB1
            # keep states/vals live so nothing elides
            m = jnp.max(full)

            def st(b, c):
                states_s[0, b] = (states0_ref[0, b] + t) % K
                vals_s[0, b] = m
                return c
            jax.lax.fori_loop(0, B, st, 0)
        hist_ref[0] = sv

    return kern


def run_variant(name, B, K, Tm, do_dma, do_fold, do_pick):
    from flash_viterbi_tpu.bench.harness import marginal_time

    S = K // 128
    rng = np.random.default_rng(0)
    logA = jnp.asarray(rng.standard_normal((K, S, 128)), jnp.float32)
    emits = jnp.asarray(rng.standard_normal((Tm, S, 128)), jnp.float32)
    vals0 = jnp.asarray(np.sort(rng.standard_normal(B))[::-1].copy(),
                        jnp.float32)
    states0 = jnp.arange(B, dtype=jnp.int32)
    kern = make_kernel(B, K, Tm, do_dma, do_fold, do_pick)

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

    import functools

    @functools.partial(jax.jit, static_argnames="k")
    def chained(v0, e, k):
        h = None
        for _ in range(k):
            h = call(v0, e)
            v0 = v0 + h[0, 0, :].astype(jnp.float32) * jnp.float32(1e-30)
        return h

    def make_chain(k):
        return lambda: chained(vals0, emits, k=k)

    per = marginal_time(make_chain)
    print(f"{name:28s} per-call {per*1e3:8.3f} ms  per-step {per/Tm*1e6:7.2f} us",
          flush=True)
    return per


if __name__ == "__main__":
    B, K, Tm = 64, 4096, 255
    run_variant("full(dma+fold+pick)", B, K, Tm, True, True, True)
    run_variant("no-pick", B, K, Tm, True, True, False)
    run_variant("no-fold(dma+pick)", B, K, Tm, True, False, True)
    run_variant("no-dma(fold+pick)", B, K, Tm, False, True, True)
    run_variant("dma-only", B, K, Tm, True, False, False)
    run_variant("empty", B, K, Tm, False, False, False)
