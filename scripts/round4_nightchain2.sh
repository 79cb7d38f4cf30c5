#!/bin/bash
# Round-4 -> round-5 chain, link 2 (nohup'd).  Waits for the 800HZ top-up
# chunk (launched by round4_endchain.sh via launch_round4_carryover.sh;
# T=7: 800HZ_{Bm,Hc,μa,Br,Pcv} + 400HZ_μa top-up + 400HZ_Bm reseed) to
# complete, then:
#   1. regenerate the RESULTS.md flagship table (now a full 20/20 at the
#      1000-epoch protocol, with the 400HZ_Bm bad-optimum row replaced)
#   2. persist final weights + checkpoints into git-tracked persist/
#   3. commit
#   4. launch the CvT "(many)" 8-repeat variance study on 50HZ_Bm
#      (VERDICT r3 missing #2; T=8 hardware-validated at 44.1 s/epoch,
#      ~12.25h full protocol — runs into round 5, which adds targets)
LOG=/tmp/round4_nightchain2.log
CHUNK_LOG=/tmp/chunk800.log
cd /root/repo
{
  echo "nightchain2 armed $(date -u +%H:%M:%S)"
  # wait for the chunk800 supervisor to exist first (endchain launches it
  # after the bi probe), then for its completion marker
  while [ ! -f /tmp/chunk800_sup.pid ]; do sleep 60; done
  SUP_PID=$(cat /tmp/chunk800_sup.pid)
  echo "watching chunk800 supervisor $SUP_PID"
  while true; do
    grep -q "supervisor: run completed" "$CHUNK_LOG" 2>/dev/null && break
    if ! kill -0 "$SUP_PID" 2>/dev/null; then
      echo "chunk800 supervisor exited without marker at $(date -u +%H:%M:%S)"
      break
    fi
    sleep 180
  done
  echo "chunk800 finished at $(date -u +%H:%M:%S)"

  echo "=== launching CvT (many) study 50HZ_Bm $(date -u +%H:%M:%S) ==="
  nohup python -m transformer_stm_tpu.train.supervisor \
    --log /tmp/cvt_many.log -- \
    python scripts/train_many.py 50HZ_Bm 1000 8 \
    > /dev/null 2>&1 &
  echo $! > /tmp/cvt_many_sup.pid
  echo "cvt_many supervisor pid $(cat /tmp/cvt_many_sup.pid)"

  # The chunk's in-process export evaluated on the TPU at DEFAULT matmul
  # precision (single-pass-bf16 f32 dots — understates metrics vs the
  # reference's true-f32 TF eval).  Re-evaluate the chunk's targets at
  # exact f32 on CPU (harness.test_target exact path) before the regen;
  # runs while the (many) study holds the chip.
  echo "=== exact-f32 re-eval of chunk targets $(date -u +%H:%M:%S) ==="
  timeout 7200 python scripts/reeval_metrics.py \
    800HZ_Bm 800HZ_Hc 800HZ_μa 800HZ_Br 800HZ_Pcv \
    400HZ_μa 400HZ_Bm 400HZ_Br

  echo "=== flagship table regen $(date -u +%H:%M:%S) ==="
  timeout 600 python scripts/results_tables.py flagship --write
  echo "=== persist weights $(date -u +%H:%M:%S) ==="
  timeout 1200 python scripts/persist_weights.py save
  git add -f RESULTS.md persist Result/*.json Result/Excel Result/Records Result/Plots 2>/dev/null
  git commit -q -m "Land the 800HZ top-up chunk: full 20/20 flagship table at the 1000-epoch protocol" \
    && echo "committed $(git log --oneline -1)"
  echo "NIGHTCHAIN2 DONE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
