"""Headline benchmark: FLASH full-state decode, K=3965, T=256 (paper config).

Prints ONE JSON line: trellis updates (K^2*T)/s on one chip, compared to the
reference C SIEVE-Mp baseline at the same config (672.6 s == 5.98 M updates/s,
/root/reference/README.md:79 — see BASELINE.md).  Exact path parity against
the framework's numpy oracle is asserted before reporting.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

K, M, T, PROB, SEED = 3965, 50, 256, 0.112, 1
BASELINE_UPDATES_PER_S = (3965.0**2 * 256.0) / 672.6  # C SIEVE-Mp, README.md:79


def main() -> None:
    global K, M, T, PROB
    if "--smoke" in sys.argv:
        K, M, T, PROB = 256, 10, 64, 0.2

    import jax
    import jax.numpy as jnp

    from flash_viterbi_tpu import build, make_sparse_hmm
    from flash_viterbi_tpu.oracle import framework as oracle

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=PROB, seed=SEED)
    lh = hmm.log().padded(128)

    dec = build("flash", num_segments=8, mode="pointer")
    logA = jax.device_put(jnp.asarray(lh.logA), dev)
    logB = jax.device_put(jnp.asarray(lh.logB), dev)
    logPi = jax.device_put(jnp.asarray(lh.logPi), dev)
    yd = jax.device_put(jnp.asarray(y, jnp.int32), dev)

    fn = jax.jit(dec)
    path = np.asarray(jax.block_until_ready(fn(logA, logB, logPi, yd)))  # compile

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(logA, logB, logPi, yd))
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))

    want = oracle.vanilla(hmm.A, hmm.B, hmm.Pi, y)
    parity = bool((path[:T] == want).all())
    if not parity:
        print(f"# PARITY FAILURE: {int((path[:T] != want).sum())}/{T} mismatches",
              file=sys.stderr)

    updates_per_s = (K * K * T) / wall
    print(json.dumps({
        "metric": "trellis_updates_per_s",
        "value": updates_per_s,
        "unit": "updates/s",
        "vs_baseline": updates_per_s / BASELINE_UPDATES_PER_S,
        "wall_s": wall,
        "config": f"K={K},T={T},prob={PROB},flash pointer N=8",
        "exact_path_parity": parity,
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
