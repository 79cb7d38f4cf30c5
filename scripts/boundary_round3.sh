#!/bin/bash
# Round-3 idle-chip measurement window, part 1 (run between training
# chunks; part 2 — attention sweep, 512px, ViT-B ft — runs in the
# end-of-round window after the last chunk):
#  1. fused inference-layer kernel validation on hardware (new r3 kernel)
#  2. vmapped-trainer width ceiling probe (VERDICT r2 #4)
#  3. ViT-S @224 inference attention A/B incl. fused path (north star)
# Each step logs to /tmp/boundary_r3.log; failures don't stop the rest.
set -x
LOG=${1:-/tmp/boundary_r3.log}
cd /root/repo
{
  echo "=== boundary window start $(date +%H:%M:%S) ==="
  timeout 900 python scripts/validate_fused_layer_tpu.py
  echo "=== width probe $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/probe_multi_width.py
  echo "=== vit infer probe $(date +%H:%M:%S) ==="
  timeout 1800 python scripts/probe_vit_infer.py
  echo "=== boundary window part 1 done $(date +%H:%M:%S) ==="
} >> "$LOG" 2>&1
