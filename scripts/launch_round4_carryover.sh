#!/bin/bash
# Launch the round-4 carryover training at the END of the round-3 session
# (it runs past round end; the round-4 session finds it via /tmp/*.log and
# the supervisor survives as a nohup'd process — same pattern as the
# round-2 -> round-3 chunk handoff).
#
# Contents: 800HZ top-ups to the full 1000-epoch protocol (current rows
# are 400-600-epoch runs; fresh seeds retrain from scratch at T=5, the
# conservatively-known-good width).  The CvT "(many)" 8-repeat study and
# img-only variants stay with round 4 proper — pick their width from
# Result/multi_width_probe.json (T=8/10/12 entries, end-window probe).
cd /root/repo
nohup bash scripts/supervise_train_all.sh 1000 1 /tmp/chunk800.log \
  800HZ_Bm 800HZ_Hc 800HZ_μa 800HZ_Br 800HZ_Pcv \
  > /dev/null 2>&1 &
echo $! > /tmp/chunk800_sup.pid
echo "launched 800HZ top-up chunk (supervisor pid $(cat /tmp/chunk800_sup.pid))"
