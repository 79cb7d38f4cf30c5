#!/bin/bash
# Round-3 session-3 night chain (nohup'd, survives tool timeouts):
# wait for the chunkY training supervisor to finish (completion marker in
# its log, or its pid exiting), then run the end-window measurement
# script.  The agent polls /tmp/nightchain.log and launches the round-4
# carryover chunk after inspecting the results.
LOG=/tmp/nightchain.log
CHUNK_LOG=${1:-/tmp/chunkY.log}
SUP_PID=$(cat /tmp/chunkY_sup.pid 2>/dev/null)
cd /root/repo
{
  echo "night chain armed $(date -u +%H:%M:%S) (sup pid ${SUP_PID:-?})"
  while true; do
    grep -q "supervisor: run completed" "$CHUNK_LOG" 2>/dev/null && break
    if [ -n "$SUP_PID" ] && ! kill -0 "$SUP_PID" 2>/dev/null; then
      echo "supervisor exited without marker at $(date -u +%H:%M:%S)"
      break
    fi
    sleep 120
  done
  echo "chunkY finished at $(date -u +%H:%M:%S); settling 60s"
  sleep 60
  bash scripts/endwindow_round3.sh /tmp/endwindow_r3.log
  echo "END WINDOW DONE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
