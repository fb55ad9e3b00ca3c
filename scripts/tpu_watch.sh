#!/bin/bash
# Probe the TPU tunnel until it answers, then drain the round-2 hardware
# queue: measurement steps, the pytest TPU tier, bench.py, and the
# config-5 long run.  Exactly one TPU process at a time (everything runs
# sequentially in this loop).
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
    # cheapest, highest-value artifact first: a brief tunnel window should
    # at least produce the round's headline bench line
    echo "== bench.py =="
    timeout 3600 python bench.py > results/bench_r2.json 2> results/bench_r2.log
    echo "bench exit: $?"
    echo "== round2_measure =="
    timeout 5400 python scripts/round2_measure.py > results/round2_measure.log 2>&1
    echo "measure exit: $?"
    echo "== pytest tpu tier =="
    FVT_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_hw.py -q \
      > results/tpu_tier.log 2>&1
    echo "tpu tier exit: $?"
    echo "== config5 =="
    timeout 14400 python scripts/config5_run.py > results/config5.log 2>&1
    echo "config5 exit: $?"
    exit 0
  fi
  echo "probe $i failed ($(date -u +%H:%M:%S)): $(tail -c 200 /tmp/tpu_probe.out | tr '\n' ' ')"
  sleep 120
done
echo "TPU never came back before the deadline"
exit 1
