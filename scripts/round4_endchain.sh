#!/bin/bash
# Round-4 end-of-chunkY chain (nohup'd; replaces round4_chain.sh's step 5).
#
# At chunkY completion (6 targets T=6: 200HZ_Pcv, 400HZ_{Bm,Hc,Br,Pcv},
# 50HZ_Hc reseed):
#   1. fused2 bi=16 timing probe (~20 min of now-idle chip; bi=16
#      AOT-compile-verified at a 64M scoped-VMEM cap earlier today)
#   2. regenerate the RESULTS.md flagship table from the run artifacts
#   3. persist final weights + latest checkpoints into git-tracked persist/
#   4. commit the milestone
#   5. launch the 800HZ top-up chunk (runs past round end; round 5 resumes)
LOG=/tmp/round4_endchain.log
CHUNK_LOG=${1:-/tmp/chunkY.log}
cd /root/repo
{
  echo "round-4 endchain armed $(date -u +%H:%M:%S)"
  SUP_PID=$(cat /tmp/chunkY_sup.pid 2>/dev/null)
  while true; do
    grep -q "supervisor: run completed" "$CHUNK_LOG" 2>/dev/null && break
    if [ -n "$SUP_PID" ] && ! kill -0 "$SUP_PID" 2>/dev/null; then
      echo "supervisor exited without marker at $(date -u +%H:%M:%S)"
      break
    fi
    sleep 120
  done
  echo "chunkY finished at $(date -u +%H:%M:%S)"

  echo "=== fused bi probe $(date -u +%H:%M:%S) ==="
  timeout 2400 python scripts/probe_fused_bi.py
  echo "=== flagship table regen $(date -u +%H:%M:%S) ==="
  timeout 600 python scripts/results_tables.py flagship --write
  echo "=== persist weights $(date -u +%H:%M:%S) ==="
  timeout 1200 python scripts/persist_weights.py save
  # Result/ is gitignored (Weight/ holds 1.6G of raw weights); force-add
  # the analysis artifacts only — persist_weights mirrors the weights.
  git add RESULTS.md persist
  git add -f Result/*.json Result/Excel Result/Records Result/Plots
  git commit -q -m "Land the chunkY results: flagship table regen, persisted weights, bi probe" \
    && echo "committed $(git log --oneline -1)"

  echo "=== launching 800HZ chunk $(date -u +%H:%M:%S) ==="
  bash scripts/launch_round4_carryover.sh
  echo "ROUND-4 ENDCHAIN DONE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
