"""Qwen3-4B fused decode-block ablation (on-chip, round 3).

Times the N=4 write-ahead greedy block at bench shapes with components
knocked out, to find where the non-GEMV ~2.6 ms/step lives (VERDICT r2
weak #1: ~1.4 ms KV write + ~1.2 ms lm_head of a 16.6 ms single step).

Variants (cost probes — numerics are wrong where noted):
- base:       production decode_wa x4 (flush + attention + lm_head/step)
- noflush:    pend flush skipped           (KV-write cost)
- headlast:   lm_head only on step 3       (lm_head amortization ceiling)
- noattn:     attention output zeroed      (attention + flush-dep cost)

Run: python scripts/qwen3_step_ablation.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pegainfer_tpu.models import qwen3 as q3
from pegainfer_tpu.ops import sampling as smp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench as bench_mod

print("backend:", jax.default_backend(), flush=True)

cfg = bench_mod.qwen3_4b_config()
params = q3.init_bench_params(cfg)
NUM_PAGES, PS = 64, 64  # 0.6 GB pool: leaves room for the 8 GB params + copies
kv = q3.make_kv_pages(cfg, NUM_PAGES, PS)
B, P, N = 1, 32, 4
CTX = 1024

tables = jnp.asarray(
    np.arange(1, P + 1, dtype=np.int32).reshape(B, P))
positions0 = jnp.full((B,), CTX, jnp.int32)
seq0 = jnp.full((B,), CTX + 1, jnp.int32)
tok0 = jnp.full((B,), 17, jnp.int32)


def block(mode):
    def run(params_, kv_, pend, tok, pos, sl):
        outs = []
        for i in range(N):
            ab = ()
            if mode == "noflush":
                ab = ("noflush",)
            elif mode == "noattn":
                ab = ("noattn",)
            elif mode == "headlast" and i < N - 1:
                ab = ("nohead",)
            kv_, pend, logits = q3.decode_wa(
                cfg, params_, kv_, pend, tok, pos, tables, sl,
                use_pallas=True, _ablate=ab,
            )
            tok = smp.sample_greedy(logits)
            outs.append(tok)
            pos, sl = pos + 1, sl + 1
        return kv_, pend, jnp.stack(outs)

    return jax.jit(run, donate_argnums=(1, 2))


def timeit(name, mode):
    fn = block(mode)
    kv_ = jnp.array(kv)  # fresh donated buffer
    pend = q3.make_pend(cfg, B)
    t0 = time.time()
    kv_, pend, toks = fn(params, kv_, pend, tok0, positions0, seq0)
    np.asarray(toks)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        kv_, pend, toks = fn(params, kv_, pend, tok0, positions0, seq0)
        np.asarray(toks)
        best = min(best, (time.time() - t0) / N)
    del kv_, pend, toks
    print(f"{name:10s} {best*1e3:7.3f} ms/step (compile {compile_s:.0f}s)",
          flush=True)
    return best


base = timeit("base", "base")
nf = timeit("noflush", "noflush")
hl = timeit("headlast", "headlast")
na = timeit("noattn", "noattn")
print(f"\nKV-write cost  : {(base-nf)*1e3:6.3f} ms/step")
print(f"lm_head amort. : {(base-hl)*1e3:6.3f} ms/step (ceiling if fully amortized)")
print(f"attn(+flushdep): {(base-na)*1e3:6.3f} ms/step")
