"""HTTP serving load benchmark: concurrency-ladder sweep over /v1/completions.

Reference: scripts/bench_http_serving.py (628 LoC harness recording QPS,
TTFT, TPOT/ITL percentiles, error rate, output hashes) — this is the
streaming-SSE client side; run it against a live pegainfer-tpu server.

``python -m pegainfer_tpu.bench.http_sweep --base-url http://localhost:8000
  --concurrency 1,2,4,8 --requests 16 --prompt-len 256 --max-tokens 64``
"""

from __future__ import annotations

import argparse
import asyncio
import hashlib
import json
import statistics
import sys
import time
from typing import Dict, List

import aiohttp


def _pct(vals: List[float], p: float) -> float:
    if not vals:
        return float("nan")
    s = sorted(vals)
    return s[min(int(len(s) * p / 100), len(s) - 1)]


async def one_request(session, base_url, prompt, max_tokens):
    t0 = time.perf_counter()
    stamps: List[float] = []
    text_parts: List[str] = []
    async with session.post(
        f"{base_url}/v1/completions",
        json={"prompt": prompt, "max_tokens": max_tokens, "stream": True,
              "ignore_eos": True},
    ) as resp:
        if resp.status != 200:
            return {"error": resp.status}
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            obj = json.loads(line[len("data: "):])
            choices = obj.get("choices") or []
            if choices and choices[0].get("text"):
                stamps.append(time.perf_counter())
                text_parts.append(choices[0]["text"])
    if not stamps:
        return {"error": "no tokens"}
    itls = [b - a for a, b in zip(stamps, stamps[1:])]
    return {
        "ttft_ms": (stamps[0] - t0) * 1e3,
        "e2e_ms": (stamps[-1] - t0) * 1e3,
        "itl_ms": [d * 1e3 for d in itls],
        "n_chunks": len(stamps),
        "hash": hashlib.sha256("".join(text_parts).encode()).hexdigest()[:16],
    }


async def sweep_level(base_url, concurrency, n_requests, prompt, max_tokens):
    async with aiohttp.ClientSession() as session:
        sem = asyncio.Semaphore(concurrency)
        t0 = time.perf_counter()

        async def task():
            async with sem:
                return await one_request(session, base_url, prompt, max_tokens)

        results = await asyncio.gather(*[task() for _ in range(n_requests)])
        wall = time.perf_counter() - t0

    ok = [r for r in results if "error" not in r]
    errors = len(results) - len(ok)
    ttfts = [r["ttft_ms"] for r in ok]
    itls = [d for r in ok for d in r["itl_ms"]]
    return {
        "concurrency": concurrency,
        "requests": n_requests,
        "errors": errors,
        "qps": len(ok) / wall,
        "ttft_ms": {"p50": _pct(ttfts, 50), "p95": _pct(ttfts, 95)},
        "itl_ms": {"p50": _pct(itls, 50), "p95": _pct(itls, 95)},
        "output_hashes": sorted({r["hash"] for r in ok}),
    }


def main(argv=None):
    p = argparse.ArgumentParser("pegainfer-tpu http sweep")
    p.add_argument("--base-url", default="http://localhost:8000")
    p.add_argument("--concurrency", default="1,2,4,8")
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--prompt", default=None)
    p.add_argument("--prompt-len", type=int, default=256)
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    prompt = args.prompt or ("benchmark " * args.prompt_len).strip()
    levels = [int(c) for c in args.concurrency.split(",")]
    report: Dict = {"base_url": args.base_url, "levels": []}
    for c in levels:
        level = asyncio.run(
            sweep_level(args.base_url, c, args.requests, prompt, args.max_tokens)
        )
        report["levels"].append(level)
        print(json.dumps(level))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
