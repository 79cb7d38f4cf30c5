#!/bin/bash
# Round-5: the CvT "(many)" repeat-run variance study on the flagship
# (VERDICT r3 #7; reference models/CvT(Par)(many).py:501-505 — 8 repeats
# per target, artifacts suffixed _{time}).
#
# Targets chosen for the variance STORY, pairing the FFN study:
#   50HZ_Hc  — our one flagship loss was a bad-seed local optimum; the
#              repeat distribution shows whether that's seed luck
#   800HZ_Bm — the FFN (many) study found this target bimodal (7/8 good,
#              1/8 collapses onto the reference's committed 0.779)
#
# Chip cost at the hardware-validated widths (Result/multi_width_probe
# .json): T=8 (8 vmapped repeats) = 44.1 s/epoch -> 12.25 h per target
# at the full 1000-epoch protocol.  BOTH targets at full protocol do not
# fit one round, so pass epochs explicitly:
#   bash scripts/launch_round5_many.sh 1000 50HZ_Hc            # 1 target, full
#   bash scripts/launch_round5_many.sh 600 50HZ_Hc 800HZ_Bm    # 2 targets,
#     reduced (lr has decayed x0.8^12 ~= 0.069 of peak by 600; note the
#     epoch count in RESULTS.md when using this)
# Targets run sequentially, each under the in-framework supervisor
# (checkpoint-resume makes tunnel deaths lossless).
EPOCHS=${1:-1000}
shift 2>/dev/null
TARGETS=${@:-50HZ_Hc}
cd /root/repo
nohup bash -c "
  for t in $TARGETS; do
    python -m transformer_stm_tpu.train.supervisor \
      --log /tmp/cvt_many_\$t.log -- \
      python scripts/train_many.py \$t $EPOCHS 8
  done
  echo '=== round5 many chain done ==='
" > /tmp/round5_many.log 2>&1 &
echo $! > /tmp/round5_many.pid
echo "launched CvT (many) chain: $TARGETS at $EPOCHS epochs x 8 repeats (pid $(cat /tmp/round5_many.pid))"
