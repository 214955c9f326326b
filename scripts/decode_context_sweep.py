"""Decode TPOT vs context length (reference analog:
pegainfer-qwen3-4b/src/bin/qwen3_decode_context.rs:12-15 — sweeps decode
TPOT across context 128→10k).

Run on the TPU host: ``python scripts/decode_context_sweep.py``.
Prints one line per context length; optionally tune --chunk-pages.
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

from pegainfer_tpu.utils.compile_cache import enable  # noqa: E402

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pegainfer_tpu.models import qwen3 as q3  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contexts", default="128,512,1024,2048,4096,8192,16384")
    ap.add_argument("--num-pages", type=int, default=1280)
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    cfg = q3.Qwen3Config(
        hidden_size=2560, intermediate_size=9728, num_hidden_layers=36,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        vocab_size=151936, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, max_position_embeddings=40960,
    )
    params = q3.init_bench_params(cfg)
    B = args.batch

    def step(params, kv, pend, tok, P, pos_val):
        tables = jnp.broadcast_to(
            jnp.arange(1, P + 1, dtype=jnp.int32)[None, :], (B, P)
        )  # all rows share pages: fine for timing
        pos = jnp.full((B,), pos_val, jnp.int32)
        kv, pend, logits = q3.decode_wa(
            cfg, params, kv, pend, tok, pos, tables, pos + 1, use_pallas=True
        )
        return kv, pend, jnp.argmax(logits, -1).astype(jnp.int32)

    for ctx in [int(c) for c in args.contexts.split(",")]:
        P = max(8, -(-(ctx + args.iters + 1) // args.page_size))
        pow2 = 8
        while pow2 < P:
            pow2 *= 2
        P = pow2
        kv = q3.make_kv_pages(cfg, args.num_pages, args.page_size)
        pend = q3.make_pend(cfg, B)
        jl = jax.jit(functools.partial(step, P=P, pos_val=ctx),
                     donate_argnums=(1, 2))
        tok = jnp.zeros(B, jnp.int32)
        kv, pend, out = jl(params, kv, pend, tok)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            kv, pend, out = jl(params, kv, pend, out)
        _ = np.asarray(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        kv_gb = ctx * cfg.num_hidden_layers * 2 * cfg.num_key_value_heads \
            * cfg.head_dim * 2 * B / 1e9
        print(f"ctx={ctx:6d} P={P:4d}: {ms:7.2f} ms/step  "
              f"(live KV {kv_gb:.2f} GB)", flush=True)
        del kv, pend


if __name__ == "__main__":
    main()
