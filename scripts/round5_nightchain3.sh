#!/bin/bash
# Chain link 3 (armed in round 4, expected to fire in round 5): waits for
# the CvT "(many)" variance study (launched by round4_nightchain2.sh) to
# complete, commits its artifacts, then launches the img-only variant
# chunk (VERDICT r3 missing #4) so the chip never idles unattended.
LOG=/tmp/round5_nightchain3.log
CHUNK_LOG=/tmp/cvt_many.log
cd /root/repo
{
  echo "nightchain3 armed $(date -u +%H:%M:%S)"
  while [ ! -f /tmp/cvt_many_sup.pid ]; do sleep 300; done
  SUP_PID=$(cat /tmp/cvt_many_sup.pid)
  echo "watching cvt_many supervisor $SUP_PID"
  while true; do
    grep -q "supervisor: run completed" "$CHUNK_LOG" 2>/dev/null && break
    if ! kill -0 "$SUP_PID" 2>/dev/null; then
      echo "cvt_many supervisor exited without marker at $(date -u +%H:%M:%S)"
      break
    fi
    sleep 300
  done
  echo "cvt_many finished at $(date -u +%H:%M:%S)"

  echo "=== cvt-many table regen $(date -u +%H:%M:%S) ==="
  timeout 600 python scripts/results_tables.py cvt-many --write
  echo "=== persist weights $(date -u +%H:%M:%S) ==="
  timeout 1200 python scripts/persist_weights.py save
  git add -f RESULTS.md persist Result/*.json Result/Excel Result/Records 2>/dev/null
  git commit -q -m "Land the CvT (many) 8-repeat variance study artifacts" \
    && echo "committed $(git log --oneline -1)"

  echo "=== launching img-only chunk $(date -u +%H:%M:%S) ==="
  bash scripts/launch_imgonly_chunk.sh
  echo "NIGHTCHAIN3 DONE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
