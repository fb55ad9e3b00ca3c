#!/bin/bash
# Probe the TPU tunnel until it answers, then drain the round-3 hardware
# queue.  Exactly one TPU process at a time (everything runs sequentially
# in this loop).
#
# ORDER (round-2 lesson: the watcher ran bench/measure first and buried
# the kernel-bug diagnosis):
#   1. pytest TPU tier   — isolates kernel bugs in minutes; everything
#                          else is meaningless if this is red
#   2. bench.py          — the round's headline artifact (has its own
#                          pallas->XLA fallback, so it always emits JSON)
#   3. round3_measure.py — the measurement queue (per-step containment)
#   4. config5_run.py    — the hours-scale north-star run
#
# Deadline-based (default 10 h of probing) rather than attempt-counted:
# probe failures can be fast (connection refused) or slow (180 s hang),
# so a fixed attempt budget exhausts unpredictably.
cd /root/repo || exit 1
# cwd is NOT on sys.path for `python scripts/foo.py`; keep the axon TPU
# plugin's site dir (never clobber it — the TPU registers from there)
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
DEADLINE=$(( $(date +%s) + ${TPU_WATCH_BUDGET_S:-36000} ))
i=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  i=$((i + 1))
  if timeout 180 python -c "import jax; d=jax.devices(); assert d and d[0].platform=='tpu', d; print(d)" \
      > /tmp/tpu_probe.out 2>&1; then
    echo "TPU up at attempt $i ($(date -u +%H:%M:%S)): $(cat /tmp/tpu_probe.out)"
    # every step is idempotent-guarded: an artifact that already records a
    # SUCCESSFUL run is not re-run (hours-scale steps; manual runs count)
    if ! grep -q "passed" results/tpu_tier.log 2>/dev/null; then
      echo "== pytest tpu tier =="
      FVT_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_hw.py -q \
        > results/tpu_tier.log 2>&1
      echo "tpu tier exit: $?"
    fi
    if ! grep -q '"exact_path_parity": true' results/bench_r3.json 2>/dev/null; then
      echo "== bench.py =="
      timeout 3600 python bench.py > results/bench_r3.json 2> results/bench_r3.log
      echo "bench exit: $?"
    fi
    if ! grep -q '"step": "DONE"' results/round3_measure.log 2>/dev/null; then
      echo "== round3_measure =="
      timeout 7200 python scripts/round3_measure.py > results/round3_measure.log 2>&1
      echo "measure exit: $?"
    fi
    if ! grep -q "CONFIG5 OK" results/config5.log 2>/dev/null; then
      echo "== config5 =="
      timeout 14400 python scripts/config5_run.py > results/config5.log 2>&1
      echo "config5 exit: $?"
    fi
    if ! grep -q '"step": "DONE"' results/sieve_bs_witness.log 2>/dev/null; then
      echo "== sieve_bs witness =="
      timeout 21600 python scripts/sieve_bs_witness.py > results/sieve_bs_witness.log 2>&1
      echo "witness exit: $?"
    fi
    exit 0
  fi
  echo "probe $i failed ($(date -u +%H:%M:%S)): $(tail -c 200 /tmp/tpu_probe.out | tr '\n' ' ')"
  sleep 120
done
echo "TPU never came back before the deadline"
exit 1
