#!/bin/bash
# Round-5: img-only CvT hardware runs (VERDICT r3 #10; reference
# models/CvT(Img).py:440-455 — same CvT minus the process-parameter
# branch, artifacts under the Images folders).  The reference commits no
# img-only metrics, so this is parity of exercise: real trained weights,
# Predictions_Metrics xlsx, and plots in Result/{Weight,Excel,Plots}/Images.
#
# 3 targets spanning the frequency range; T=3 measured ~15.1 s/epoch ->
# ~4.2 h at the full 1000-epoch protocol.
#   bash scripts/launch_round5_imgonly.sh [epochs] [targets...]
EPOCHS=${1:-1000}
shift 2>/dev/null
TARGETS=${@:-50HZ_Bm 200HZ_Pcv 800HZ_Hc}
cd /root/repo
TSTM_MULTI_INPUTS=img nohup python -m transformer_stm_tpu.train.supervisor \
  --log /tmp/imgonly.log -- \
  python scripts/train_all.py "$EPOCHS" 1 $TARGETS \
  > /dev/null 2>&1 &
echo $! > /tmp/imgonly_sup.pid
echo "launched img-only chunk: $TARGETS at $EPOCHS epochs (pid $(cat /tmp/imgonly_sup.pid))"
