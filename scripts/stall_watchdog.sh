#!/bin/bash
# Tunnel-stall watchdog for supervised training chunks.
#
# The axon tunnel can stall so that the JAX client futex-waits forever
# (mid-run) or freezes in device-init backoff (startup) — see CLAUDE.md.
# The chunk supervisor (supervise_train_all.sh) only retries when its
# python child EXITS, so a frozen client wedges the whole chunk.  This
# watchdog kills the trainer whenever the chunk log stops advancing, and
# the supervisor's retry loop takes it from there (checkpoint-resume
# makes the kill lossless up to checkpoint_every epochs).
#
# Strict process match: ps fields must be exactly
# "python scripts/train_all.py ..." — never a pattern kill, so an
# interactive shell whose command line merely mentions train_all.py
# cannot match.
#
# Usage: nohup bash scripts/stall_watchdog.sh /tmp/chunkY.log 720 &
LOG=${1:-/tmp/chunkY.log}
STALE_S=${2:-720}
OUT=/tmp/stall_watchdog.log
echo "watchdog armed $(date -u +%H:%M:%S) log=$LOG stale=${STALE_S}s" >> "$OUT"
while true; do
  sleep 120
  [ -f "$LOG" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -gt "$STALE_S" ]; then
    pids=$(ps -eo pid=,args= | awk '$2=="python" && $3=="scripts/train_all.py" {print $1}')
    for p in $pids; do
      # double-check the pid is older than the staleness window so we
      # never kill a fresh attempt still inside its first compile
      et=$(ps -o etimes= -p "$p" 2>/dev/null | tr -d ' ')
      if [ -n "$et" ] && [ "$et" -gt "$STALE_S" ]; then
        kill "$p" && echo "$(date -u +%H:%M:%S) log stale ${age}s -> killed trainer $p (etimes=$et)" >> "$OUT"
      fi
    done
  fi
done
