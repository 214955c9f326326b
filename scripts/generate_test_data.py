"""Generate golden greedy outputs from HF Transformers for a checkpoint.

Reference analog: scripts/generate_test_data.py → test_data/{model}.json —
the committed ground truth the engine must match token-for-token
(qwen3-4b/tests/e2e.rs). Run where the checkpoint + torch are available:

  python scripts/generate_test_data.py --model-path /path/Qwen3-4B \
      --out test_data/Qwen3-4B.json --max-new-tokens 50

Then run the gated e2e:

  PEGAINFER_TEST_MODEL_PATH=/path/Qwen3-4B python -m pytest \
      tests/test_golden_e2e.py -q
"""

from __future__ import annotations

import argparse
import json
import os

PROMPTS = [
    "The capital of France is",
    "def fibonacci(n):",
    "Once upon a time, in a land far away,",
    "The chemical formula for water is",
    "To be or not to be, that is",
    "1 + 1 = 2, 2 + 2 = 4, 4 + 4 =",
    "The quick brown fox",
    "In machine learning, overfitting means",
    "El sol sale por el",
    "A haiku about mountains:",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max-new-tokens", type=int, default=50)
    args = p.parse_args()

    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.model_path)
    model = AutoModelForCausalLM.from_pretrained(
        args.model_path, torch_dtype=torch.bfloat16
    ).eval()

    cases = []
    for prompt in PROMPTS:
        ids = tok.encode(prompt, add_special_tokens=False)
        with torch.no_grad():
            out = model.generate(
                torch.tensor([ids]), max_new_tokens=args.max_new_tokens,
                do_sample=False, pad_token_id=tok.eos_token_id or 0,
            )[0][len(ids):].tolist()
        cases.append({
            "prompt": prompt,
            "prompt_tokens": ids,
            "output_tokens": out,
            "output_text": tok.decode(out),
        })

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "model_path": args.model_path,
            "max_new_tokens": args.max_new_tokens,
            "cases": cases,
        }, f, indent=1)
    print(f"wrote {len(cases)} cases to {args.out}")


if __name__ == "__main__":
    main()
