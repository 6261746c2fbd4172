#!/bin/bash
# Round-3 TPU measurement campaign. Runs the ordered plan with a tunnel
# probe between steps; aborts remaining TPU steps on the first wedge so
# a dead tunnel doesn't eat the whole window. Every step's output is
# appended to the log (partial results survive).
#
# Usage: tools/r3_campaign.sh [logfile]
set -u
LOG=${1:-/tmp/r3_campaign.log}
cd /root/repo

note() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

probe() {
  timeout 150 python bench.py --child probe >> "$LOG" 2>&1
}

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if ! probe; then
    note "PROBE FAILED before '$name' — tunnel wedged, stopping campaign"
    exit 1
  fi
  note "START $name"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  note "END $name rc=$rc"
}

note "campaign start"
# 1. The driver-grade artifact first: bench.py parent (north-star child
#    first inside; persists .bench_last_good.json on success).
step bench 2760 python bench.py
# 2. ONE careful first compile of the packed large-SJ kernel, isolated
#    (a Mosaic failure here must not poison the engine-integrated runs;
#    if it fails, the engine A/Bs below still measure 'panels').
step packed_probe 900 python tools/packed_probe.py packed
# 3. Covariance kernel A/B at both geometries (packed vs panels vs lag).
step lag_lab 1500 python tools/lag_lab.py --chained
# 3. Decision matrices: statistics x whitening combos, sustained RTF.
step r3_matrix_32 1800 python tools/r3_matrix.py 32
step r3_matrix_16 1500 python tools/r3_matrix.py 16
# 4. Per-stage device budget after the round-3 structural changes.
step breakdown_16 1200 python tools/device_breakdown.py 16 64 prod
step breakdown_32 1200 python tools/device_breakdown.py 32 32 prod
# 5. Quality gates ON TPU (production vs exact, bundled + north-star).
step quality_gate 1800 python tools/quality_gate.py 16
# 6. FD engine sustained speed at the round-3 coupled operating point.
step fd_bench 900 python tools/fd_bench.py
note "campaign done"
