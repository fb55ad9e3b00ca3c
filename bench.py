"""Headline benchmark: FLASH full-state decode, K=3965, T=256 (paper config).

Prints ONE JSON line: trellis updates (K^2*T)/s on one chip, compared to the
reference C SIEVE-Mp baseline at the same config (672.6 s == 5.98 M updates/s,
/root/reference/README.md:79 — see BASELINE.md).  Exact path parity against
the framework's numpy oracle is asserted before reporting.

Timing methodology: the TPU here sits behind an async tunnel whose
``block_until_ready`` does not synchronize and whose synced dispatch has a
~25 ms fixed floor; we therefore time chains of k data-dependent decodes in
a single dispatch (forced scalar readback) and report the marginal cost
(T(k2) - T(k1)) / (k2 - k1), which cancels both the floor and the enqueue
overhead.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

K, M, T, PROB, SEED = 3965, 50, 256, 0.112, 1
BASELINE_UPDATES_PER_S = (3965.0**2 * 256.0) / 672.6  # C SIEVE-Mp, README.md:79
K1, K2 = 1, 5  # chain lengths for marginal timing


def _tpu_answers(timeout_s: float = 240.0) -> bool:
    """Probe device enumeration in a CHILD process with a timeout.

    The axon TPU plugin's ``jax.devices()`` blocks indefinitely while the
    tunnel is down; probing in a child keeps this process un-wedgeable, so
    a scheduled bench run always produces its JSON line (with an explicit
    ``tpu_unreachable`` marker) instead of hanging the harness.
    """
    code = "import jax; d = jax.devices(); assert d[0].platform == 'tpu', d"
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    global K, M, T, PROB
    if "--smoke" in sys.argv:
        global K1, K2
        K, M, T, PROB = 256, 10, 64, 0.2
        K1, K2 = 1, 17  # tiny decode: longer chain so the marginal
        # signal clears the ~ms sync-noise floor

    # fall back to CPU (with a marker) when the TPU plugin is registered
    # but its tunnel does not answer — never hang the round's bench run
    tpu_unreachable = False
    if os.environ.get("PALLAS_AXON_POOL_IPS") and "--cpu" not in sys.argv:
        if not _tpu_answers():
            tpu_unreachable = True

    import jax

    if tpu_unreachable or "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flash_viterbi_tpu import make_sparse_hmm
    from flash_viterbi_tpu.algorithms.flash import flash_decode
    from flash_viterbi_tpu.oracle import native as oracle

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    print(f"# device: {dev}", file=sys.stderr)

    hmm, y = make_sparse_hmm(K=K, M=M, T=T, prob=PROB, seed=SEED)
    lh = hmm.log().padded(128)
    logA = jnp.asarray(lh.logA)
    logB = jnp.asarray(lh.logB)
    logPi0 = jnp.asarray(lh.logPi)
    yd = jnp.asarray(y, jnp.int32)

    # arrays are explicit jit arguments (closed-over constants get embedded
    # in the remote-compile payload and overflow its size limit at large K);
    # k is STATIC and the chain python-unrolled: a traced fori_loop forces a
    # hard barrier between iterations and measures ~11 ms/decode slower at
    # the headline config (XLA pipelines the unrolled chain's independent
    # work across iterations — sustained throughput, the r1-comparable
    # methodology).  Costs one compile per chain length; k1/k2 only.
    import functools

    def make_chain(use_pallas):
        @functools.partial(jax.jit, static_argnames="k")
        def chain(logA, logB, logPi, yd, k):
            p = None
            for _ in range(k):
                p = flash_decode(logA, logB, logPi, yd, num_segments=16,
                                 use_pallas=use_pallas)
                # data dependency that provably cannot change logPi's bits
                logPi = logPi + p[0].astype(jnp.float32) * jnp.float32(1e-30)
            return p

        return chain

    # containment (round-2 lesson): one broken kernel must never zero the
    # round's headline artifact — on ANY failure of the Pallas path, retry
    # on the proven XLA path and mark the row
    pallas_fallback = False
    chain = make_chain("auto")
    try:
        path = np.asarray(chain(logA, logB, logPi0, yd, k=K1))  # compile+sample
    except Exception as e:  # noqa: BLE001 — lowering/trace errors included
        print(f"# PALLAS PATH FAILED, retrying XLA: {type(e).__name__}: {e}",
              file=sys.stderr)
        pallas_fallback = True
        chain = make_chain(False)
        path = np.asarray(chain(logA, logB, logPi0, yd, k=K1))
    int(chain(logA, logB, logPi0, yd, k=K2)[0])  # second compile (k=K2)

    def run(k, reps=3):
        ts = []
        for i in range(reps):
            arg = logPi0 + jnp.float32(i) * jnp.float32(1e-30)
            t0 = time.perf_counter()
            int(chain(logA, logB, arg, yd, k=k)[0])  # readback = real sync
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = run(K1), run(K2)
    wall = (t2 - t1) / (K2 - K1)
    if wall <= 0.2 * t2 / K2:
        # marginal signal drowned in dispatch noise (tiny smoke problems):
        # fall back to the amortized chain time, a conservative upper bound
        wall = t2 / K2

    want = oracle.vanilla(hmm.A, hmm.B, hmm.Pi, y)
    parity = bool((path[:T] == want).all())
    if not parity:
        print(f"# PARITY FAILURE: {int((path[:T] != want).sum())}/{T} mismatches",
              file=sys.stderr)

    updates_per_s = (K * K * T) / wall
    row = {
        "metric": "trellis_updates_per_s",
        "value": updates_per_s,
        "unit": "updates/s",
        "vs_baseline": updates_per_s / BASELINE_UPDATES_PER_S,
        "wall_s": wall,
        "config": f"K={K},T={T},prob={PROB},flash N=16 pallas={on_tpu}",
        "exact_path_parity": parity,
        "device": str(dev),
    }
    if tpu_unreachable:
        row["tpu_unreachable"] = True  # CPU fallback figure, not the chip's
        try:  # carry the last recorded HW measurement with provenance so
            # an outage-window run still reports the chip's number
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "results", "bench_r5.json")) as f:
                row["last_hw_measurement"] = json.load(f)
        except Exception:
            pass
    if pallas_fallback:
        row["pallas_fallback"] = True  # XLA-path figure; kernel path broken
    print(json.dumps(row))


if __name__ == "__main__":
    main()
