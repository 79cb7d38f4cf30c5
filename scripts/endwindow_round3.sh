#!/bin/bash
# Round-3 end-of-round measurement window (run after the last training
# chunk exports, before round end):
#  1. clean attention impl sweep (auto-scaled iters — VERDICT r2 #9)
#  2. 512px high-res forward/train through the streaming kernel (#6)
#  3. ViT-B/16 fine-tune step throughput (#7)
#  4. bench.py headline (fused-layer ViT path)
# Logs to /tmp/endwindow_r3.log; failures don't stop the rest.
set -x
LOG=${1:-/tmp/endwindow_r3.log}
cd /root/repo
{
  echo "=== end window start $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/probe_fused_layer.py
  echo "=== width probe 8-12 $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/probe_multi_width.py 8 10 12
  echo "=== attention sweep $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/probe_attention.py 40
  echo "=== highres 512 $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_highres.py 512 8
  echo "=== vit-b finetune $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/bench_vit_finetune.py 64
  echo "=== bench $(date +%H:%M:%S) ==="
  timeout 1800 python bench.py
  echo "=== end window done $(date +%H:%M:%S) ==="
} >> "$LOG" 2>&1
