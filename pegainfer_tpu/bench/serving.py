"""In-process serving benchmark: the reference bench_serving equivalent.

Reference: pegainfer-server/src/bin/bench_serving.rs — request/snapshot/
compare subcommands, snapshot schema (prefill_heavy 10k/1 + decode_heavy
1024/256, warmup + measured iters, TTFT/steady-TPOT percentiles), and the
regression thresholds (steady TPOT > 2% or TTFT > 3% fails,
docs/conventions/bench-regression.md).

Run: ``python -m pegainfer_tpu.bench.serving snapshot --model-path … --out …``
     ``python -m pegainfer_tpu.bench.serving compare baseline.json new.json``
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pegainfer_tpu.engine.contract import (
    EngineHandle,
    Finished,
    GenerateRequest,
    SamplingParams,
    Token,
)

TPOT_REGRESSION_PCT = 2.0
TTFT_REGRESSION_PCT = 3.0


@dataclass
class CaseConfig:
    name: str
    prompt_len: int
    output_len: int
    iters: int = 20
    warmup: int = 5


DEFAULT_CASES = (
    CaseConfig("prefill_heavy", 10_000, 1, iters=5, warmup=2),
    CaseConfig("decode_heavy", 1024, 256, iters=20, warmup=5),
)


def _pct(sorted_vals: List[float], p: float) -> float:
    if not sorted_vals:
        return float("nan")
    i = min(int(len(sorted_vals) * p / 100), len(sorted_vals) - 1)
    return sorted_vals[i]


def run_case(engine: EngineHandle, case: CaseConfig, vocab_size: int,
             seed: int = 0) -> Dict:
    import numpy as np

    rng = np.random.default_rng(seed)
    params = SamplingParams(ignore_eos=True)
    ttfts: List[float] = []
    tpots: List[float] = []
    e2es: List[float] = []
    gaps: List[float] = []  # inter-token DELIVERY gaps (burst cadence)

    for it in range(case.warmup + case.iters):
        prompt = rng.integers(0, vocab_size, case.prompt_len).tolist()
        req = GenerateRequest(prompt_tokens=prompt, max_tokens=case.output_len,
                              params=params, queued_at_unix_s=time.time())
        t0 = time.perf_counter()
        engine.submit(req)
        stamps = []
        for ev in req.channel:
            if isinstance(ev, Token):
                stamps.append(time.perf_counter())
            elif isinstance(ev, Finished):
                break
        if it < case.warmup or not stamps:
            continue
        ttfts.append((stamps[0] - t0) * 1e3)
        e2es.append((stamps[-1] - t0) * 1e3)
        if len(stamps) > 2:
            # steady region: skip the first decode block
            k = min(2, len(stamps) - 2)
            tpots.append((stamps[-1] - stamps[k]) * 1e3 / (len(stamps) - 1 - k))
            gaps.extend((b - a) * 1e3
                        for a, b in zip(stamps[k:], stamps[k + 1:]))

    ttfts.sort()
    tpots.sort()
    e2es.sort()
    gaps.sort()
    out = {
        "prompt_len": case.prompt_len,
        "output_len": case.output_len,
        "iters": case.iters,
        "ttft_ms": {"p50": _pct(ttfts, 50), "p95": _pct(ttfts, 95),
                    "avg": statistics.fmean(ttfts) if ttfts else float("nan")},
        "e2e_ms": {"p50": _pct(e2es, 50), "p95": _pct(e2es, 95)},
    }
    if tpots:
        out["steady_tpot_ms"] = {"p50": _pct(tpots, 50), "p95": _pct(tpots, 95)}
        out["decode_tok_s"] = 1e3 / _pct(tpots, 50)
    if gaps:
        # token delivery cadence (VERDICT r4 #2): tokens arrive in
        # decode-block bursts; worst gap = the longest stall an SSE
        # consumer sees (block size × TPOT in steady state)
        out["delivery_gap_ms"] = {"p95": _pct(gaps, 95), "worst": gaps[-1]}
    return out


def run_concurrent(engine: EngineHandle, concurrency: int, prompt_len: int,
                   output_len: int, vocab_size: int, iters: int = 3,
                   warmup: int = 1, seed: int = 0) -> Dict:
    """Batched-decode point: ``concurrency`` simultaneous streams.

    Per iteration all requests are submitted together and consumed on
    threads; reports per-request steady TPOT percentiles and aggregate
    output throughput (reference: bench_serving.rs `curve`)."""
    import threading

    import numpy as np

    rng = np.random.default_rng(seed)
    params = SamplingParams(ignore_eos=True)
    tpots: List[float] = []
    ttfts: List[float] = []
    rates: List[float] = []

    for it in range(warmup + iters):
        reqs = [
            GenerateRequest(
                prompt_tokens=rng.integers(0, vocab_size, prompt_len).tolist(),
                max_tokens=output_len, params=params,
                queued_at_unix_s=time.time(),
            )
            for _ in range(concurrency)
        ]
        stamps: List[List[float]] = [[] for _ in reqs]

        def consume(i, req):
            for ev in req.channel:
                if isinstance(ev, Token):
                    stamps[i].append(time.perf_counter())
                elif isinstance(ev, Finished):
                    break

        t0 = time.perf_counter()
        threads = []
        for i, req in enumerate(reqs):
            engine.submit(req)
            th = threading.Thread(target=consume, args=(i, req))
            th.start()
            threads.append(th)
        for th in threads:
            th.join()
        t1 = time.perf_counter()
        if it < warmup:
            continue
        n_out = sum(len(s) for s in stamps)
        rates.append(n_out / (t1 - t0))
        for s in stamps:
            if len(s) > 2:
                k = min(2, len(s) - 2)
                tpots.append((s[-1] - s[k]) * 1e3 / (len(s) - 1 - k))
            if s:
                ttfts.append((s[0] - t0) * 1e3)

    tpots.sort()
    ttfts.sort()
    return {
        "concurrency": concurrency,
        "prompt_len": prompt_len,
        "output_len": output_len,
        "iters": iters,
        "steady_tpot_ms": {"p50": _pct(tpots, 50), "p95": _pct(tpots, 95)},
        "ttft_ms": {"p50": _pct(ttfts, 50), "p95": _pct(ttfts, 95)},
        "output_tok_s": statistics.fmean(rates) if rates else float("nan"),
    }


def snapshot(engine: EngineHandle, vocab_size: int, model: str,
             cases=DEFAULT_CASES, hardware: str = "",
             curve_concurrency=(), curve_prompt_len: int = 1024,
             curve_output_len: int = 128, curve_iters: int = 3) -> Dict:
    out = {
        "model": model,
        "hardware": hardware,
        "created_unix_s": int(time.time()),
        "cases": {c.name: run_case(engine, c, vocab_size) for c in cases},
    }
    if curve_concurrency:
        out["curve"] = [
            run_concurrent(engine, int(c), curve_prompt_len, curve_output_len,
                           vocab_size, iters=curve_iters)
            for c in curve_concurrency
        ]
    return out


def compare(baseline: Dict, new: Dict) -> List[str]:
    """Regression check. Returns failure strings (empty = pass)."""
    failures = []
    for name, base_case in baseline.get("cases", {}).items():
        new_case = new.get("cases", {}).get(name)
        if new_case is None:
            failures.append(f"{name}: missing in new snapshot")
            continue
        bt = base_case.get("steady_tpot_ms", {}).get("p50")
        nt = new_case.get("steady_tpot_ms", {}).get("p50")
        if bt and nt and nt > bt * (1 + TPOT_REGRESSION_PCT / 100):
            failures.append(
                f"{name}: steady TPOT p50 regressed {bt:.2f} -> {nt:.2f} ms "
                f"(>{TPOT_REGRESSION_PCT}%)"
            )
        bf = base_case.get("ttft_ms", {}).get("p50")
        nf = new_case.get("ttft_ms", {}).get("p50")
        if bf and nf and nf > bf * (1 + TTFT_REGRESSION_PCT / 100):
            failures.append(
                f"{name}: TTFT p50 regressed {bf:.2f} -> {nf:.2f} ms "
                f"(>{TTFT_REGRESSION_PCT}%)"
            )
    return failures


def _build_engine(args):
    from pegainfer_tpu.engine.contract import EngineLoadOptions

    opts = EngineLoadOptions(max_num_pages=args.max_num_pages)
    if args.sim:
        from pegainfer_tpu.sim import SimulatedEngineConfig, start_engine

        cfg = SimulatedEngineConfig(ttft_s=0.002, tpot_s=0.001)
        return start_engine(cfg, opts), cfg.vocab_size, "sim"
    if args.random_qwen3_4b:
        # true Qwen3-4B shapes, device-side constant weights (timing is
        # data-independent) — the reference snapshot workload without a
        # checkpoint download
        from bench import qwen3_4b_config
        from pegainfer_tpu.engine.jax_executor import JaxExecutor
        from pegainfer_tpu.engine.scheduler import start_scheduler
        from pegainfer_tpu.models import qwen3 as q3

        cfg = qwen3_4b_config()
        params = q3.init_bench_params(cfg)
        if getattr(args, "quant", None) == "int8":
            params = q3.quantize_params_int8(params)
        # 64-token pages: the measured decode optimum (docs/PERF.md)
        runtime = q3.make_runtime(cfg, params, num_pages=args.max_num_pages or 192,
                                  page_size=64)
        return (
            start_scheduler(JaxExecutor(runtime, opts)),
            cfg.vocab_size,
            "qwen3-4b-randomweights",
        )
    if getattr(args, "random_qwen3_8b", False):
        # Qwen3-8B (BASELINE.json target: "Qwen3-8B with top-k/top-p
        # sampling, single chip"): a bf16 tree is ~16.4 GB — over one
        # v5e chip's HBM — so single-chip 8B serves int8 weight-only,
        # with params created directly in the int8 container.
        from pegainfer_tpu.engine.jax_executor import JaxExecutor
        from pegainfer_tpu.engine.scheduler import start_scheduler
        from pegainfer_tpu.models import qwen3 as q3

        cfg = q3.Qwen3Config(
            hidden_size=4096, intermediate_size=12288, num_hidden_layers=36,
            num_attention_heads=32, num_key_value_heads=8, head_dim=128,
            vocab_size=151936, rms_norm_eps=1e-6, rope_theta=1000000.0,
            tie_word_embeddings=False, eos_token_id=151645,
            stop_token_ids=(151645,), max_position_embeddings=40960,
        )
        params = q3.init_bench_params_int8(cfg)
        runtime = q3.make_runtime(cfg, params,
                                  num_pages=args.max_num_pages or 192,
                                  page_size=64)
        return (
            start_scheduler(JaxExecutor(runtime, opts)),
            cfg.vocab_size,
            "qwen3-8b-randomweights-int8",
        )
    if getattr(args, "random_qwen35_4b", False):
        from pegainfer_tpu.engine.jax_executor import JaxExecutor
        from pegainfer_tpu.engine.scheduler import start_scheduler
        from pegainfer_tpu.models import qwen35 as q35

        cfg = q35.bench_config()
        params = q35.init_bench_params(cfg)
        if getattr(args, "quant", None) == "int8":
            params = q35.quantize_params_int8(params)
        runtime = q35.make_runtime(cfg, params,
                                   num_pages=args.max_num_pages or 192,
                                   page_size=64, flat_decode=True)
        return (
            start_scheduler(JaxExecutor(runtime, opts)),
            cfg.vocab_size,
            "qwen3.5-4b-randomweights",
        )
    from pegainfer_tpu.server.main import detect_model_type

    mtype = detect_model_type(args.model_path)
    if mtype == "qwen3":
        from pegainfer_tpu.models import qwen3_engine

        handle = qwen3_engine.start_engine(args.model_path, opts)
        from pegainfer_tpu.models.qwen3 import Qwen3Config

        vocab = Qwen3Config.from_model_path(args.model_path).vocab_size
    elif mtype == "qwen35":
        from pegainfer_tpu.models import qwen35_engine

        handle = qwen35_engine.start_engine(args.model_path, opts)
        from pegainfer_tpu.models.qwen35 import Qwen35Config

        vocab = Qwen35Config.from_model_path(args.model_path).vocab_size
    else:
        from pegainfer_tpu.models import dsv4_engine

        handle = dsv4_engine.start_engine(args.model_path, opts)
        from pegainfer_tpu.models.dsv4 import DSv4Config

        vocab = DSv4Config.from_model_path(args.model_path).vocab_size
    return handle, vocab, args.model_path


def main(argv=None):
    p = argparse.ArgumentParser("pegainfer-tpu bench_serving")
    sub = p.add_subparsers(dest="cmd", required=True)

    snap = sub.add_parser("snapshot")
    snap.add_argument("--model-path")
    snap.add_argument("--sim", action="store_true")
    snap.add_argument("--random-qwen35-4b", action="store_true")
    snap.add_argument("--random-qwen3-8b", action="store_true",
                      help="Qwen3-8B shapes, int8 weight-only (single-chip)")
    snap.add_argument("--random-qwen3-4b", action="store_true",
                      help="bench-shaped Qwen3-4B without a checkpoint")
    snap.add_argument("--out", required=True)
    snap.add_argument("--hardware", default="tpu-v5e")
    snap.add_argument("--max-num-pages", type=int, default=None)
    snap.add_argument("--quick", action="store_true",
                      help="small iters for smoke runs")

    snap.add_argument("--quant", default=None, choices=[None, "int8"],
                      help="weight-only quant mode for the random builders")
    snap.add_argument("--curve", default="1,2,4,8",
                      help="concurrency ladder for the batched-decode "
                           "table ('' disables)")

    cmp_ = sub.add_parser("compare")
    cmp_.add_argument("baseline")
    cmp_.add_argument("new")

    cur = sub.add_parser("curve", help="concurrency ladder (batched decode)")
    cur.add_argument("--model-path")
    cur.add_argument("--sim", action="store_true")
    cur.add_argument("--random-qwen35-4b", action="store_true")
    cur.add_argument("--random-qwen3-8b", action="store_true")
    cur.add_argument("--random-qwen3-4b", action="store_true")
    cur.add_argument("--concurrency", default="1,2,4,8,16")
    cur.add_argument("--prompt-len", type=int, default=1024)
    cur.add_argument("--output-len", type=int, default=128)
    cur.add_argument("--iters", type=int, default=3)
    cur.add_argument("--out", default=None)
    cur.add_argument("--max-num-pages", type=int, default=None)

    req = sub.add_parser(
        "request", help="one ad-hoc case: TTFT/TPOT for a single "
                        "prompt-len/output-len (reference: bench_serving "
                        "request)")
    req.add_argument("--model-path")
    req.add_argument("--sim", action="store_true")
    req.add_argument("--random-qwen35-4b", action="store_true")
    req.add_argument("--random-qwen3-8b", action="store_true")
    req.add_argument("--random-qwen3-4b", action="store_true")
    req.add_argument("--prompt-len", type=int, default=512)
    req.add_argument("--output-len", type=int, default=64)
    req.add_argument("--iters", type=int, default=3)
    req.add_argument("--max-num-pages", type=int, default=None)

    mat = sub.add_parser("matrix", help="sweep a (prompt x output) grid")
    mat.add_argument("--model-path")
    mat.add_argument("--sim", action="store_true")
    mat.add_argument("--random-qwen35-4b", action="store_true")
    mat.add_argument("--random-qwen3-8b", action="store_true")
    mat.add_argument("--random-qwen3-4b", action="store_true")
    mat.add_argument("--prompts", default="128,1024,4096")
    mat.add_argument("--outputs", default="64,256")
    mat.add_argument("--iters", type=int, default=5)
    mat.add_argument("--out", default=None)
    mat.add_argument("--max-num-pages", type=int, default=None)

    args = p.parse_args(argv)
    if args.cmd == "request":
        engine, vocab, model = _build_engine(args)
        case = CaseConfig("request", args.prompt_len, args.output_len,
                          iters=args.iters, warmup=1)
        data = run_case(engine, case, vocab)
        engine.shutdown()
        print(json.dumps({"model": model, **data}, indent=2))
        return 0
    if args.cmd == "curve":
        engine, vocab, model = _build_engine(args)
        rows = [
            run_concurrent(engine, int(c), args.prompt_len, args.output_len,
                           vocab, iters=args.iters)
            for c in args.concurrency.split(",")
        ]
        engine.shutdown()
        data = {"model": model, "curve": rows}
        print(json.dumps(rows, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(data, f, indent=2)
        return 0
    if args.cmd == "matrix":
        engine, vocab, model = _build_engine(args)
        cases = [
            CaseConfig(f"p{pl}_o{ol}", int(pl), int(ol), iters=args.iters,
                       warmup=1)
            for pl in args.prompts.split(",")
            for ol in args.outputs.split(",")
        ]
        data = snapshot(engine, vocab, model, cases)
        engine.shutdown()
        print(json.dumps(data["cases"], indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(data, f, indent=2)
        return 0
    if args.cmd == "snapshot":
        engine, vocab, model = _build_engine(args)
        cases = DEFAULT_CASES
        curve = tuple(int(c) for c in args.curve.split(",") if c)
        curve_kw = dict(curve_prompt_len=1024, curve_output_len=128,
                        curve_iters=3)
        if args.quick:
            cases = (
                CaseConfig("prefill_heavy", 512, 1, iters=2, warmup=1),
                CaseConfig("decode_heavy", 128, 32, iters=3, warmup=1),
            )
            curve = curve[:2]
            curve_kw = dict(curve_prompt_len=128, curve_output_len=16,
                            curve_iters=1)
        snap_data = snapshot(engine, vocab, model, cases, args.hardware,
                             curve_concurrency=curve, **curve_kw)
        engine.shutdown()
        with open(args.out, "w") as f:
            json.dump(snap_data, f, indent=2)
        print(json.dumps(snap_data["cases"], indent=2))
        return 0
    else:
        with open(args.baseline) as f:
            base = json.load(f)
        with open(args.new) as f:
            new = json.load(f)
        failures = compare(base, new)
        for fmsg in failures:
            print("REGRESSION:", fmsg)
        if not failures:
            print("PASS: within thresholds "
                  f"(TPOT {TPOT_REGRESSION_PCT}%, TTFT {TTFT_REGRESSION_PCT}%)")
        return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
