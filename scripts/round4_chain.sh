#!/bin/bash
# Round-4 chain (nohup'd, survives tool timeouts).
#
# Strategy: the measurement window runs FIRST the moment the tunnel
# returns (it is ~1.5 h of chip and lands BENCH_r04 + VERDICT #3/4/5/8
# this round even if training then takes the rest); the chunkY trainer
# (20/20-table gate, resumes losslessly from its checkpoint) gets the
# chip back right after, and the 800HZ top-up chunk launches when chunkY
# completes.
#
#   1. probe loop: wait until a tiny TPU matmul succeeds
#   2. stop the chunkY supervisor + trainer (strict pid-file / argv
#      match, never a pattern kill; checkpoint@>=400 makes it lossless)
#   3. measurement window:
#        - fused-layer v1/v2 A/B timing (VERDICT #3, 10k img/s headline)
#        - T=8/10/12 width probe with the bn scaling (VERDICT #8)
#        - 512px streaming high-res bench (VERDICT #4)
#        - ViT-B fine-tune throughput (VERDICT #5)
#        - bench.py headline (refreshes BENCH_LAST_GOOD.json)
#   4. relaunch the chunkY supervisor (same env: TSTM_MULTI_SEED)
#   5. wait for its completion marker, then launch the 800HZ chunk
LOG=/tmp/round4_chain.log
CHUNK_LOG=${1:-/tmp/chunkY.log}
cd /root/repo
{
  echo "round-4 chain v2 armed $(date -u +%H:%M:%S)"

  # -- 1. wait for the tunnel ------------------------------------------------
  while true; do
    if timeout 150 python - <<'PYEOF' >/dev/null 2>&1
import jax
jax.config.update("jax_platforms", "")
import jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float((x @ x).sum()) > 0
PYEOF
    then
      echo "tunnel is BACK at $(date -u +%H:%M:%S)"
      break
    fi
    sleep 120
  done

  # -- 2. stop the supervisor + trainer (lossless: checkpointed) -------------
  SUP_PID=$(cat /tmp/chunkY_sup.pid 2>/dev/null)
  if [ -n "$SUP_PID" ] && kill -0 "$SUP_PID" 2>/dev/null; then
    kill "$SUP_PID" 2>/dev/null
    echo "stopped chunkY supervisor $SUP_PID"
  fi
  for p in $(ps -eo pid=,args= | awk '$2=="python" && $3=="scripts/train_all.py" {print $1}'); do
    kill "$p" 2>/dev/null && echo "stopped trainer $p"
  done
  sleep 10

  # -- 3. measurement window --------------------------------------------------
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

  # -- 4. relaunch chunkY -----------------------------------------------------
  TSTM_MULTI_SEED="50HZ_Hc=7" nohup bash scripts/supervise_train_all.sh \
    1000 1 "$CHUNK_LOG" 200HZ_Pcv 400HZ_Bm 400HZ_Hc 400HZ_Br 400HZ_Pcv 50HZ_Hc \
    > /dev/null 2>&1 &
  echo $! > /tmp/chunkY_sup.pid
  echo "relaunched chunkY supervisor $(cat /tmp/chunkY_sup.pid) at $(date -u +%H:%M:%S)"

  # -- 5. wait for completion, then the 800HZ chunk ---------------------------
  SUP_PID=$(cat /tmp/chunkY_sup.pid)
  while true; do
    grep -q "supervisor: run completed" "$CHUNK_LOG" 2>/dev/null && break
    if ! kill -0 "$SUP_PID" 2>/dev/null; then
      echo "supervisor exited without marker at $(date -u +%H:%M:%S)"
      break
    fi
    sleep 120
  done
  echo "chunkY finished at $(date -u +%H:%M:%S)"
  bash scripts/launch_round4_carryover.sh
  echo "ROUND-4 CHAIN DONE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
