#!/bin/bash
# Round-3 idle-chip measurement window (run between training chunks):
#  1. vmapped-trainer width ceiling probe (VERDICT r2 #4)
#  2. ViT-S @224 inference attention A/B + batch sweep (north-star lever)
#  3. clean attention impl sweep re-run (VERDICT r2 #9)
#  4. 512px high-res forward/train measurement (VERDICT r2 #6)
#  5. ViT-B/16 fine-tune step throughput (VERDICT r2 #7)
# Each step logs to /tmp/boundary_r3.log; failures don't stop the rest.
set -x
LOG=${1:-/tmp/boundary_r3.log}
cd /root/repo
{
  echo "=== boundary window start $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/probe_multi_width.py
  echo "=== vit infer probe $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/probe_vit_infer.py
  echo "=== attention sweep $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/probe_attention.py 40
  echo "=== highres 512 $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_highres.py 512 8
  echo "=== vit-b finetune $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_vit_finetune.py 64
  echo "=== boundary window done $(date +%H:%M:%S) ==="
} >> "$LOG" 2>&1
