#!/bin/bash
# Tunnel-recovery watch: probes the axon tunnel on a sparse cadence
# (each killed probe is itself a mid-compile kill and can prolong a
# wedge — see bench.py docstring) and starts the round-3 measurement
# campaign on the first healthy probe, then exits.
#
# Usage: tools/wedge_watch.sh [logfile] [sleep_between_probes_s]
set -u
LOG=${1:-/tmp/wedge_watch.log}
INTERVAL=${2:-1500}
cd /root/repo

while true; do
  echo "=== $(date -u +%H:%M:%S) probe" >> "$LOG"
  # A wedged tunnel either hangs the probe (~28 min observed before the
  # remote end reports UNAVAILABLE) or errors; either way rc != 0.
  if timeout 1800 python bench.py --child probe >> "$LOG" 2>&1; then
    echo "=== $(date -u +%H:%M:%S) tunnel healthy - campaign" >> "$LOG"
    bash tools/r3_campaign.sh /tmp/r3_campaign2.log >> "$LOG" 2>&1
    echo "=== $(date -u +%H:%M:%S) campaign finished" >> "$LOG"
    exit 0
  fi
  echo "=== $(date -u +%H:%M:%S) probe failed rc=$? - sleeping $INTERVAL" >> "$LOG"
  sleep "$INTERVAL"
done
