#!/bin/bash
# Resilient driver for the 20-target run: the axon tunnel stalls/crashes
# sporadically (see CLAUDE.md); train_all.py checkpoints every N epochs and
# resumes from the latest stacked checkpoint, so just restart until done.
# Silent wedges (futex-wait, no exit) are handled IN the framework now:
# train/watchdog.py force-exits the trainer with code 75 when a dispatch
# outlives its deadline (TSTM_WATCHDOG_S, default 720), and this loop's
# retry picks it up — scripts/stall_watchdog.sh is no longer required.
EPOCHS=${1:-1000}
EPC=${2:-10}
LOG=${3:-/tmp/train_all.log}
shift 3 || true
TARGETS="$@"
# Watchdog: bench.py SIGSTOPs the trainer for clean measurements and
# resumes it via atexit/signal handlers — but a SIGKILLed bench can't.
# SIGCONT any T-state trainer every 5 min as a last resort (SIGCONT on a
# running process is a no-op, so this is always safe) — UNLESS bench.py's
# pause flag is fresh (< 40 min old): that stop is intentional, and a
# blind CONT would time-share the chip mid-measurement.  A leaked flag
# goes stale and the rescue resumes.
PAUSE_FLAG="${TSTM_BENCH_PAUSE_FLAG:-/tmp/tstm_bench_pause}"
(
  while true; do
    sleep 300
    if [ -f "$PAUSE_FLAG" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$PAUSE_FLAG" 2>/dev/null || echo 0) ))
      [ "$age" -lt 2400 ] && continue
    fi
    for pid in $(ps -eo pid=,stat=,args= | awk '$2 ~ /^T/ && /scripts\/train_all\.py/ {print $1}'); do
      kill -CONT "$pid" 2>/dev/null && echo "watchdog: SIGCONT $pid" >> "$LOG"
    done
  done
) &
WATCHDOG=$!
trap 'kill $WATCHDOG 2>/dev/null' EXIT
for i in $(seq 1 200); do
  echo "=== supervisor attempt $i $(date +%H:%M:%S) ===" >> "$LOG"
  python scripts/train_all.py "$EPOCHS" "$EPC" $TARGETS >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== supervisor: run completed ===" >> "$LOG"
    break
  fi
  echo "=== supervisor: exit $rc; retry in 120s ===" >> "$LOG"
  sleep 120
done
