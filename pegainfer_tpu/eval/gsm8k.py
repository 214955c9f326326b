"""GSM8K accuracy eval over the HTTP API.

Reference: scripts/ gsm8k eval + docs/benchmarks/accuracy-eval-results.md
(Qwen3-4B 85.37% vs HF 85.82%, pass threshold |Δ| <= 1%). The dataset is
not bundled (zero-egress environment): pass a local JSONL with
{"question": ..., "answer": ...} rows (GSM8K main/test format, answers
ending in "#### <number>").

``python -m pegainfer_tpu.eval.gsm8k --data gsm8k_test.jsonl
  --base-url http://localhost:8000 --shots 5 --limit 200``
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from typing import List, Optional

import requests

ANSWER_RE = re.compile(r"####\s*([\-0-9\.,]+)")
NUMBER_RE = re.compile(r"-?[\d,]+(?:\.\d+)?")


def extract_gold(answer: str) -> Optional[str]:
    m = ANSWER_RE.search(answer)
    return m.group(1).replace(",", "").rstrip(".") if m else None


def extract_pred(text: str) -> Optional[str]:
    m = ANSWER_RE.search(text)
    if m:
        return m.group(1).replace(",", "").rstrip(".")
    nums = NUMBER_RE.findall(text)
    return nums[-1].replace(",", "") if nums else None


def build_prompt(shots: List[dict], question: str) -> str:
    parts = []
    for s in shots:
        parts.append(f"Question: {s['question']}\nAnswer: {s['answer']}\n")
    parts.append(f"Question: {question}\nAnswer:")
    return "\n".join(parts)


def main(argv=None):
    p = argparse.ArgumentParser("pegainfer-tpu gsm8k eval")
    p.add_argument("--data", required=True, help="gsm8k test JSONL")
    p.add_argument("--base-url", default="http://localhost:8000")
    p.add_argument("--shots", type=int, default=5)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--max-tokens", type=int, default=512)
    args = p.parse_args(argv)

    rows = [json.loads(line) for line in open(args.data)]
    shots, rest = rows[: args.shots], rows[args.shots:]
    if args.limit:
        rest = rest[: args.limit]

    correct = 0
    for i, row in enumerate(rest):
        prompt = build_prompt(shots, row["question"])
        r = requests.post(
            f"{args.base_url}/v1/completions",
            json={"prompt": prompt, "max_tokens": args.max_tokens,
                  "stop": ["\nQuestion:"]},
            timeout=600,
        )
        r.raise_for_status()
        text = r.json()["choices"][0]["text"]
        gold = extract_gold(row["answer"])
        pred = extract_pred(text)
        correct += int(gold is not None and pred == gold)
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{len(rest)} acc={correct / (i + 1):.4f}", flush=True)

    acc = correct / max(len(rest), 1)
    print(json.dumps({"accuracy": acc, "n": len(rest), "shots": args.shots}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
