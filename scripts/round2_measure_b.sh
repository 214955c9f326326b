#!/bin/bash
# Round-2 follow-up measurements (after round2_measure.sh):
#  - mixed-load rerun with the fixed warmup (the first run compiled the
#    adaptive mixed-chunk shapes mid-measurement -> bogus 4.5 s worst gap)
#  - DSv4 slot prefix cache warm-vs-cold TTFT on the scaled config
#  - EP ragged-a2a on-chip degenerate drive (VERDICT item 5 evidence)
# Usage: round2_measure_b.sh [pid-to-wait-for]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r2m

if [ $# -ge 1 ]; then
  echo "waiting for pid $1 (previous measurement queue)..."
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
  sleep 95
fi

probe() {
  python scripts/tpu_probe.py || { echo "relay down — abort"; exit 2; }
}

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name ==="
  probe
  sleep 95
  "$@" > "/tmp/r2m/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -6 "/tmp/r2m/$name.log"
  sleep 95
}

run mixed_adaptive2 timeout 3000 python -u scripts/mixed_load_bench.py
run mixed_fixed2 timeout 3000 env PEGAINFER_MIXED_CHUNK=2048 \
  python -u scripts/mixed_load_bench.py
run dsv4_prefix timeout 3000 python -u scripts/dsv4_prefix_probe.py \
  --base 1024 --suffix 16
run dsv4_ep_drive timeout 3000 python -u scripts/drive_verify_dsv4_r2.py

echo "ALL DONE (b) — logs in /tmp/r2m"
