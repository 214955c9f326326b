"""bench.serving harness over the sim engine (reference:
tests/test_bench_http_serving.py — the benchmark client itself is
regression-tested without hardware)."""

import json

from pegainfer_tpu.bench import serving
from pegainfer_tpu.engine.contract import EngineLoadOptions
from pegainfer_tpu.sim import SimulatedEngineConfig, start_engine


def _engine():
    cfg = SimulatedEngineConfig(ttft_s=0.002, tpot_s=0.001)
    return start_engine(cfg, EngineLoadOptions()), cfg.vocab_size


def test_snapshot_and_compare(tmp_path):
    engine, vocab = _engine()
    try:
        cases = (serving.CaseConfig("decode_heavy", 16, 8, iters=2, warmup=1),)
        snap = serving.snapshot(engine, vocab, "sim", cases,
                                curve_concurrency=(1, 2), curve_prompt_len=16,
                                curve_output_len=4, curve_iters=1)
    finally:
        engine.shutdown()
    case = snap["cases"]["decode_heavy"]
    assert case["iters"] == 2
    assert case["steady_tpot_ms"]["p50"] > 0
    assert len(snap["curve"]) == 2
    assert snap["curve"][1]["concurrency"] == 2
    assert snap["curve"][1]["output_tok_s"] > 0

    # compare: identical snapshots pass; 10% slower TPOT fails
    assert serving.compare(snap, snap) == []
    worse = json.loads(json.dumps(snap))
    worse["cases"]["decode_heavy"]["steady_tpot_ms"]["p50"] *= 1.10
    fails = serving.compare(snap, worse)
    assert fails and "TPOT" in fails[0]


def test_run_concurrent_counts_all_streams():
    engine, vocab = _engine()
    try:
        row = serving.run_concurrent(engine, 3, 8, 5, vocab, iters=2, warmup=0)
    finally:
        engine.shutdown()
    assert row["concurrency"] == 3
    assert row["steady_tpot_ms"]["p50"] > 0
    assert row["ttft_ms"]["p95"] >= row["ttft_ms"]["p50"]
