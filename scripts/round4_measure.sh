#!/bin/bash
# Round-4 serial TPU measurement sweep (one process at a time on the
# tunnel). Run AFTER the flagship probes: each stage logs to /tmp.
set -x
cd /root/repo

# 1. FP4 GEMV: SWAR vs arith rate + grouped prefill-chain rate
timeout 3600 python scripts/fp4_gemv_bench.py > /tmp/r4_fp4_bench.log 2>&1
echo "fp4_bench rc=$?"

# 2. DSv4 scaled resident bench (stacked-operand fix expected to help)
PEGAINFER_BENCH_MODEL=dsv4 PEGAINFER_BENCH_QUANT=resident \
  timeout 2700 python bench.py > /tmp/r4_dsv4_scaled.log 2>&1
echo "dsv4_scaled rc=$?"

# 3. DSv4 scaled bf16 (same harness for the bf16 row of the snapshot)
PEGAINFER_BENCH_MODEL=dsv4 \
  timeout 2700 python bench.py > /tmp/r4_dsv4_bf16.log 2>&1
echo "dsv4_bf16 rc=$?"

# 4. Qwen3.5 bf16 flat (VERDICT #5: TTFT with the flat prefill)
PEGAINFER_BENCH_MODEL=qwen35 \
  timeout 2700 python bench.py > /tmp/r4_qwen35.log 2>&1
echo "qwen35 rc=$?"

# 5. Mixed-load worst-gap A/B (VERDICT #7): default vs 512-token chunks
timeout 2700 python scripts/mixed_load_bench.py > /tmp/r4_mixed_1024.log 2>&1
echo "mixed_default rc=$?"
PEGAINFER_MIXED_CHUNK=512 \
  timeout 2700 python scripts/mixed_load_bench.py > /tmp/r4_mixed_512.log 2>&1
echo "mixed_512 rc=$?"

# 6. Headline bench incl. the second driver-captured family
timeout 2700 python bench.py > /tmp/r4_headline.log 2>&1
echo "headline rc=$?"
