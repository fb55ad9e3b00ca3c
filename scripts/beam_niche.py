"""VERDICT r4 item 5: measure the beam kernel's claimed large-B*K niche.

SCALE.md kept the Pallas beam kernel available for "very large B*K where
XLA's per-op scheduling re-materializes the (B, K) scores" — with no
measurement at any such shape.  The kernel's packed-code extraction
bounds B <= 128 (ops/pallas/beam.py), so the largest reachable shape is
K=16384, B=128 (B*K = 2M, 32x the headline's 64x3965).  This measures
the full flash_bs decode both ways there (and at the headline shape as
a control), marginal-slope chains, and prints one JSON line per row.
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


def sync(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def marginal(f, k1=1, k2=3):
    sync(f(k1)); sync(f(k2))
    t0 = time.time(); sync(f(k1)); t1 = time.time(); sync(f(k2)); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def row(K, M, T, B, prob, use_pallas):
    from flash_viterbi_tpu.algorithms.flash_bs import flash_bs_decode
    from flash_viterbi_tpu.models.generate import make_sparse_hmm

    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=prob, seed=1)
    lh = hmm.log().padded(128)
    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi = jnp.asarray(lh.logPi)
    yd = jnp.asarray(np.asarray(y), jnp.int32)

    @functools.partial(jax.jit, static_argnames="k")
    def chain(logA, logB, logPi, yd, k):
        p = None
        y2 = yd
        for _ in range(k):
            p = flash_bs_decode(logA, logB, logPi, y2, beam_width=B,
                                use_pallas=use_pallas)
            y2 = jnp.where(p[0] >= -1, yd, jnp.zeros_like(yd))
        return p[0]

    per = marginal(lambda k: chain(logA, logB, logPi, yd, k))
    path = np.asarray(jax.jit(
        lambda *a: flash_bs_decode(*a, beam_width=B, use_pallas=use_pallas)
    )(logA, logB, logPi, yd))
    return per, path


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    out = {}
    for name, (K, M, T, B, prob) in [
        ("headline_K3965_B64", (3965, 50, 256, 64, 0.112)),
        ("large_K16384_B128", (16384, 50, 256, 128, 0.112)),
    ]:
        res = {}
        paths = {}
        for up in (False, True):
            try:
                per, path = row(K, M, T, B, prob, up)
                res["pallas" if up else "xla"] = round(per, 5)
                paths[up] = path
            except Exception as e:
                res["pallas" if up else "xla"] = f"FAIL {type(e).__name__}: {e}"
        if len(paths) == 2:
            res["bit_equal"] = bool((paths[False] == paths[True]).all())
        out[name] = res
        print(json.dumps({name: res}), flush=True)
    with open(os.path.join(os.path.dirname(__file__), os.pardir, "results",
                           "beam_niche.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
