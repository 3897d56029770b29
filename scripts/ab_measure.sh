#!/bin/bash
# Alternating fresh-process A/B: baseline worktree ($AB_BASE, default
# /tmp/r14base) vs the working tree, 2 passes each, interleaved to
# neutralize host drift.
# Usage: scripts/ab_measure.sh key1 key2 ...
set -u
BASE="${AB_BASE:-/tmp/r14base}"
KEYS="$@"
for pass in 1 2; do
  echo "== pass $pass: BASELINE"
  (cd "$BASE" && timeout 1200 python scripts/opt_measure.py $KEYS 2>/dev/null | tail -1)
  echo "== pass $pass: OPTIMIZED"
  (cd /root/repo && timeout 1200 python scripts/opt_measure.py $KEYS 2>/dev/null | tail -1)
done
