#!/bin/bash
# Round-2 measurement backlog — run when the TPU relay is back.
# One TPU process at a time, probe + cooldown between (the tunnel wedges
# on overlap; docs/PERF.md "environment facts"). Raw logs under /tmp/r2m.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r2m

probe() {
  python scripts/tpu_probe.py || { echo "relay down — abort"; exit 2; }
}

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name ==="
  probe
  # the probe itself claimed the chip — respect the single-client cooldown
  # (~75-90 s; starting sooner wedges the next client silently)
  sleep 95
  "$@" > "/tmp/r2m/$name.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -5 "/tmp/r2m/$name.log"
  sleep 95
}

# 1. headline bf16 decode TPOT (the BENCH_r02 metric)
run bench_bf16 timeout 3000 python -u bench.py
# 2. int8 mode
run bench_int8 timeout 3000 env PEGAINFER_BENCH_QUANT=int8 python -u bench.py
# 3. decode context sweep at the committed default chunk (16)
run ctx_sweep timeout 1700 python -u scripts/decode_context_sweep.py \
  --page-size 64 --num-pages 320 --contexts 128,1024,4096,8192,16384
# 4. mixed load: adaptive chunking ON (default 1024) vs OFF (2048)
run mixed_adaptive timeout 3000 python -u scripts/mixed_load_bench.py
run mixed_fixed timeout 3000 env PEGAINFER_MIXED_CHUNK=2048 \
  python -u scripts/mixed_load_bench.py
# 5. qwen3.5 headline
run bench_q35 timeout 3000 env PEGAINFER_BENCH_MODEL=qwen35 python -u bench.py
# 6. Qwen3-8B int8 snapshot (quick: fewer iters; full snapshot if time)
run snap_8b timeout 4000 python -u -m pegainfer_tpu.bench.serving snapshot \
  --random-qwen3-8b --out /tmp/r2m/qwen3-8b.json --hardware tpu-v5e --quick

echo "ALL DONE — logs in /tmp/r2m"
