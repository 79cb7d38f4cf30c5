#!/bin/bash
# Round-4 chain (nohup'd, survives tool timeouts).  The chunkY supervisor
# (200HZ_Pcv + 400HZ_{Bm,Hc,Br,Pcv} + 50HZ_Hc reseed, resumes from the
# epoch-400 checkpoint) is already cycling and picks up the moment the
# tunnel returns.  This chain:
#   1. waits for chunkY to complete (marker in its log / supervisor exit)
#   2. runs the round-4 measurement window:
#        - fused-layer v1/v2 A/B timing (VERDICT #3, 10k img/s headline)
#        - T=8/10/12 width probe with the bn knob (VERDICT #8)
#        - 512px streaming high-res bench (VERDICT #4)
#        - ViT-B fine-tune throughput (VERDICT #5)
#        - bench.py headline (outage-proof; refreshes BENCH_LAST_GOOD)
#   3. launches the 800HZ top-up chunk (VERDICT #1 — runs into round 5 if
#      needed; supervisor survives as nohup)
LOG=/tmp/round4_chain.log
CHUNK_LOG=${1:-/tmp/chunkY.log}
SUP_PID=$(cat /tmp/chunkY_sup.pid 2>/dev/null)
cd /root/repo
{
  echo "round-4 chain armed $(date -u +%H:%M:%S) (sup pid ${SUP_PID:-?})"
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
  echo "=== measurement window start $(date -u +%H:%M:%S) ==="
  timeout 1800 python scripts/probe_fused_layer.py
  echo "=== width probe 8-12 $(date -u +%H:%M:%S) ==="
  timeout 2400 python scripts/probe_multi_width.py 8 10 12
  echo "=== highres 512 $(date -u +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_highres.py 512 8
  echo "=== vit-b finetune $(date -u +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_vit_finetune.py 64
  echo "=== bench $(date -u +%H:%M:%S) ==="
  timeout 2400 python bench.py
  echo "=== measurement window done $(date -u +%H:%M:%S) ==="
  bash scripts/launch_round4_carryover.sh
  echo "ROUND-4 CHAIN DONE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
