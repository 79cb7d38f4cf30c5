#!/bin/bash
# Resilient driver for the 20-target run: the axon tunnel stalls/crashes
# sporadically (see CLAUDE.md); train_all.py checkpoints every N epochs and
# resumes from the latest stacked checkpoint, so just restart until done.
EPOCHS=${1:-1000}
EPC=${2:-10}
LOG=${3:-/tmp/train_all.log}
shift 3 || true
TARGETS="$@"
for i in $(seq 1 200); do
  echo "=== supervisor attempt $i $(date +%H:%M:%S) ===" >> "$LOG"
  python scripts/train_all.py "$EPOCHS" "$EPC" $TARGETS >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== supervisor: run completed ===" >> "$LOG"
    break
  fi
  echo "=== supervisor: exit $rc; retry in 120s ===" >> "$LOG"
  sleep 120
done
