#!/bin/bash
# Hourly persist+commit loop for unattended long runs (the 800HZ top-up
# chunk runs past round end, and hosts have been wiped between sessions —
# round-4 session 2 lost every gitignored checkpoint).  Mirrors final
# weights + the latest checkpoint per *.ckpts into git-tracked persist/
# and commits ONLY those paths (path-scoped `git commit -- persist` so a
# concurrent interactive commit's staged files are never swept in).
#
# Usage: nohup bash scripts/persist_loop.sh [interval_s] >/tmp/persist_loop.log 2>&1 &
INTERVAL=${1:-3600}
cd /root/repo
while true; do
  sleep "$INTERVAL"
  echo "=== persist tick $(date -u +%H:%M:%S) ==="
  timeout 1200 python scripts/persist_weights.py save || continue
  git add -f persist >/dev/null 2>&1
  if ! git diff --cached --quiet -- persist; then
    git commit -q -m "Persist checkpoint snapshot (automated hourly save)" -- persist \
      && echo "committed $(git log --oneline -1)"
  else
    echo "no checkpoint changes"
  fi
done
