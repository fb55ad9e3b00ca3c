"""Isolate the beam kernel's runtime hang: which DMA pattern deadlocks?

Micro-kernels, one suspect each:
  p1: DMA started inside @pl.when(t==0), waited OUTSIDE the when (fold).
  p2: wait descriptor src .at[0] while start used .at[s] (shape-only).
  p3: DMA started inside an scf.for body under @pl.when, waited next step.
  p4: VMEM -> SMEM DMA (vector results to scalar memory, one per step).
  p5: roll-butterfly lex tournament correctness vs numpy.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {out}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


K, S, Tm = 256, 2, 4


def p1():
    # start B DMAs inside when(t==0); every step's body waits one of them
    # (re-arming it afterwards unconditionally)
    def kern(src_hbm, out_ref, buf, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            pltpu.make_async_copy(src_hbm.at[0], buf, sem).start()

        pltpu.make_async_copy(src_hbm.at[0], buf, sem).wait()
        out_ref[0] = buf[:]

        @pl.when(t != Tm - 1)
        def _():
            pltpu.make_async_copy(src_hbm.at[t + 1], buf, sem).start()

    x = jnp.arange(Tm * S * 128, dtype=jnp.float32).reshape(Tm, S, 128)
    out = pl.pallas_call(
        kern, grid=(Tm,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, S, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tm, S, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)
    got = np.asarray(out)
    want = np.asarray(x)
    assert (got == want).all(), (got[0, 0, :4], want[0, 0, :4])
    return "bit-ok"


def p3():
    # start DMAs from INSIDE an scf.for body under @pl.when; wait next step
    B = 4

    def kern(src_hbm, out_ref, buf, sems):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            def issue(b, c):
                pltpu.make_async_copy(src_hbm.at[0], buf.at[b],
                                      sems.at[b]).start()
                return c
            jax.lax.fori_loop(0, B, issue, 0)

        def wait(b, c):
            pltpu.make_async_copy(src_hbm.at[0], buf.at[b],
                                  sems.at[b]).wait()
            return c
        jax.lax.fori_loop(0, B, wait, 0)
        out_ref[0] = buf[0]

        def reissue(b, c):
            @pl.when(t != Tm - 1)
            def _():
                pltpu.make_async_copy(src_hbm.at[t + 1], buf.at[b],
                                      sems.at[b]).start()
            return c
        jax.lax.fori_loop(0, B, reissue, 0)

    x = jnp.arange(Tm * S * 128, dtype=jnp.float32).reshape(Tm, S, 128)
    out = pl.pallas_call(
        kern, grid=(Tm,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, S, 128), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tm, S, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, S, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
    )(x)
    got = np.asarray(out)
    assert (got == np.asarray(x)).all()
    return "bit-ok"


def p4():
    # VMEM -> SMEM DMA: vector result read back as scalars next step
    def kern(out_ref, vbuf, sbuf, sem):
        t = pl.program_id(0)
        vbuf[:] = jnp.full((1, 8), t, jnp.int32)
        pltpu.make_async_copy(vbuf, sbuf, sem).start()
        pltpu.make_async_copy(vbuf, sbuf, sem).wait()
        acc = jnp.zeros((1, 8), jnp.int32)
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

        def rd(b, a):
            return jnp.where(iot == b, sbuf[0, b] + 1, a)
        out_ref[0] = jax.lax.fori_loop(0, 8, rd, acc)

    out = pl.pallas_call(
        kern, grid=(Tm,),
        out_specs=pl.BlockSpec((1, 1, 8), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tm, 1, 8), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 8), jnp.int32),
                        pltpu.SMEM((1, 8), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )()
    got = np.asarray(out)[:, 0, :]
    want = np.arange(Tm)[:, None] + np.ones((1, 8), int)
    assert (got == want).all(), got
    return "bit-ok"


def p5():
    # lex tournament == numpy lexicographic argmax
    from flash_viterbi_tpu.ops.pallas.beam import _lex_winner

    def kern(v_ref, c_ref, outv_ref, outc_ref):
        rv, rc = _lex_winner(v_ref[:], c_ref[:], S)
        outv_ref[:] = rv
        outc_ref[:] = rc

    rng = np.random.default_rng(0)
    v = rng.standard_normal((S, 128)).astype(np.float32)
    v[0, 5] = v[1, 7] = v.max() + 1.0  # forced tie
    c = (np.arange(S * 128, dtype=np.int32).reshape(S, 128)) * 256 + 3
    outv, outc = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
    )(jnp.asarray(v), jnp.asarray(c))
    outv, outc = np.asarray(outv), np.asarray(outc)
    best = min(zip(-v.ravel(), c.ravel()))  # min over (-v, c) = lex winner
    assert (outv == -best[0]).all() and (outc == best[1]).all(), (
        outv[0, :4], outc[0, :4], best)
    return "bit-ok"


if __name__ == "__main__":
    sel = sys.argv[1:]
    for name, fn in [("p1", p1), ("p3", p3), ("p4", p4), ("p5", p5)]:
        if not sel or name in sel:
            run(name, fn)
