"""Standalone paged-decode attention kernel probe (TPU).

Times ONLY the Pallas paged_attention_decode kernel at long context,
reporting effective HBM bandwidth, to separate kernel quality from the
full decode step (scripts/decode_context_sweep.py measures the step).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from pegainfer_tpu.utils.compile_cache import enable  # noqa: E402

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pegainfer_tpu.ops.pallas import paged_attention_decode  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=16384)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--layers", type=int, default=36)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chunk-pages", type=int, default=8)
    ap.add_argument("--fold-heads", action="store_true")
    args = ap.parse_args()

    B, Hq, Hkv, hd, ps, L = (args.batch, args.hq, args.hkv, args.hd,
                             args.page_size, args.layers)
    P = -(-args.ctx // ps)
    num_pages = P * B + 2
    key = jax.random.PRNGKey(0)
    pool = jax.random.normal(key, (L, Hkv, num_pages, 2, ps, hd),
                             jnp.bfloat16)
    q = jax.random.normal(key, (L, B, Hq, hd), jnp.bfloat16)
    tables = jnp.arange(1, B * P + 1, dtype=jnp.int32).reshape(B, P)
    seq_lens = jnp.full((B,), args.ctx, jnp.int32)
    scale = hd ** -0.5

    @jax.jit
    def run(q, pool):
        def layer(acc, inputs):
            li, ql = inputs
            o = paged_attention_decode(
                ql, pool, pool, tables, seq_lens, scale,
                chunk_pages=args.chunk_pages, layer_id=li,
                fold_heads=args.fold_heads)
            return acc + o.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(
            layer, jnp.float32(0.0), (jnp.arange(L, dtype=jnp.int32), q))
        return acc

    out = run(q, pool)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(q, pool)
    _ = np.asarray(out)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    gb = args.ctx * L * Hkv * hd * 2 * 2 * B / 1e9
    print(f"ctx={args.ctx} ps={ps} cp={args.chunk_pages} B={B} fold={args.fold_heads}: "
          f"{ms:.2f} ms for {L} layers  ({gb:.2f} GB -> {gb / ms * 1e3:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
