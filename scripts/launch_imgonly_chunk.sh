#!/bin/bash
# Round-5: image-only CvT variant on hardware (VERDICT r3 missing #4).
# The reference's CvT(Img).py trainer (models/CvT(Img).py:291-341) is the
# img-only counterpart of the flagship; our harness supports it
# (inputs="img") and it is fully parity-tested, but it has never produced
# hardware artifacts.  3 representative targets (one per row of the
# committed comparison narrative: a stable 50HZ, a mid 200HZ, a hard
# 800HZ) at T=3 ~= 19.4 s/epoch -> ~5.4 h for the full 1000-epoch
# protocol.  Artifacts land in the Result/*/Images folders.
#
# Usage: bash scripts/launch_imgonly_chunk.sh [targets...]
cd /root/repo
TARGETS=${@:-"50HZ_Bm 200HZ_Hc 800HZ_Pcv"}
TSTM_MULTI_INPUTS=img nohup python -m transformer_stm_tpu.train.supervisor \
  --log /tmp/chunk_img.log -- \
  python scripts/train_all.py 1000 1 $TARGETS \
  > /dev/null 2>&1 &
echo $! > /tmp/chunk_img_sup.pid
echo "launched img-only chunk ($TARGETS; supervisor pid $(cat /tmp/chunk_img_sup.pid))"
