#!/bin/bash
# Stall watchdog v2: on stall, kill the tracked pid, FORCE a worker
# restart (over-ceiling dispatch frees orphaned HBM), then relaunch.
cd /root/repo
LOG=results/config5_full.log
PIDF=/tmp/config5.pid
while true; do
  sleep 120
  if grep -q "CONFIG5-FULL" $LOG; then
    echo "$(date -u +%H:%M) run complete; watchdog exiting" >> results/config5_relaunch.log
    exit 0
  fi
  pid=$(cat $PIDF 2>/dev/null)
  age=$(( $(date +%s) - $(stat -c %Y $LOG) ))
  if [ -n "$pid" ] && kill -0 $pid 2>/dev/null && [ $age -le 450 ]; then
    continue
  fi
  echo "$(date -u +%H:%M) watchdog2: stalled ${age}s (pid $pid); bomb+relaunch" >> results/config5_relaunch.log
  [ -n "$pid" ] && kill $pid 2>/dev/null
  sleep 10
  timeout 400 python scripts/worker_reset.py > /tmp/bomb.log 2>&1
  echo "$(date -u +%H:%M) bomb exit $? ($(grep -coi 'crashed or restarted' /tmp/bomb.log) restart msg)" >> results/config5_relaunch.log
  sleep 45
  nohup env FVT_LONGFORM_VERBOSE=1 python scripts/config5_full.py --full 16 --segments 1 >> $LOG 2>&1 &
  echo $! > $PIDF
  echo "$(date -u +%H:%M) relaunched $(cat $PIDF)" >> results/config5_relaunch.log
done
