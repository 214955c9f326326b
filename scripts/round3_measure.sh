#!/bin/bash
# Round-3 snapshot refresh (VERDICT r2 #8): reference-grade statistics
# (decode_heavy 20 iters @1024/256, prefill 5 iters, curve 3) for all
# single-chip models after the round-3 perf work (adaptive blocks, flat
# union layout, fold_heads, fp4 kernel). One TPU process at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3m

probe() {
  python scripts/tpu_probe.py || { echo "relay down — abort"; exit 2; }
}

run() {
  local name=$1; shift
  echo "=== $name ==="
  probe
  sleep 95
  "$@" > "/tmp/r3m/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -3 "/tmp/r3m/$name.log"
  sleep 95
}

run snap_q3 timeout 4000 python -u -m pegainfer_tpu.bench.serving snapshot \
  --random-qwen3-4b --out bench_snapshots/tpu-v5e/qwen3-4b.json --hardware tpu-v5e
run snap_q35 timeout 4000 python -u -m pegainfer_tpu.bench.serving snapshot \
  --random-qwen35-4b --out bench_snapshots/tpu-v5e/qwen3.5-4b.json --hardware tpu-v5e
run snap_8b timeout 4800 python -u -m pegainfer_tpu.bench.serving snapshot \
  --random-qwen3-8b --out bench_snapshots/tpu-v5e/qwen3-8b.json --hardware tpu-v5e

echo "ALL DONE — logs in /tmp/r3m"
