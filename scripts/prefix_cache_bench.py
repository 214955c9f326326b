"""Warm vs cold TTFT with the prefix cache on the real chip.

Measures the three cases of the docs/PERF.md prefix-cache table for either
model family at flagship shapes (random weights — timing is data-independent):
  cold          : first sight of an 8k prompt
  warm full     : identical prompt re-sent (hybrid: resumes at the deepest
                  snapshot boundary; qwen3: at the last full page)
  warm extended : previous prompt + new tail (multi-turn shape)

Run: python scripts/prefix_cache_bench.py [qwen3|qwen35] [prompt_len]
"""
import faulthandler
import sys
import time

faulthandler.dump_traceback_later(1800, exit=True)

import numpy as np

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler

model = sys.argv[1] if len(sys.argv) > 1 else "qwen35"
plen = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

print(f"backend={jax.default_backend()} model={model} plen={plen}", flush=True)
t0 = time.time()

if model == "qwen35":
    from pegainfer_tpu.models import qwen35 as q35

    cfg = q35.bench_config()
    params = q35.init_bench_params(cfg)
    rt = q35.make_runtime(cfg, params, num_pages=192, page_size=64)
else:
    from pegainfer_tpu.models import qwen3 as q3
    import bench

    cfg = bench.qwen3_4b_config()
    params = q3.init_bench_params(cfg)
    rt = q3.make_runtime(cfg, params, num_pages=192, page_size=64)

ex = JaxExecutor(rt, EngineLoadOptions())
assert ex.prefix_cache is not None, "prefix cache off for this model"
handle = start_scheduler(ex)
print(f"[+{time.time()-t0:.0f}s] engine up (hybrid={ex._hybrid_cache})",
      flush=True)

rng = np.random.default_rng(0)


def ttft(prompt, n=4):
    req = GenerateRequest(prompt_tokens=list(prompt), max_tokens=n,
                          params=SamplingParams(ignore_eos=True))
    t = time.perf_counter()
    handle.submit(req)
    first = None
    for ev in req.channel:
        if isinstance(ev, Token) and first is None:
            first = (time.perf_counter() - t) * 1e3
        if isinstance(ev, Finished):
            break
    return first


# warmup/compile pass on a distinct prompt (pays all chunk compiles)
warm_p = rng.integers(0, cfg.vocab_size, plen).tolist()
ttft(warm_p)
ttft(warm_p)  # also compile the warm-continuation chunk sizes
print(f"[+{time.time()-t0:.0f}s] warmup done; cache "
      f"hits={ex.prefix_cache.hits} misses={ex.prefix_cache.misses}",
      flush=True)

prompt = rng.integers(0, cfg.vocab_size, plen).tolist()
ex.prefix_cache.clear()
cold = ttft(prompt)
h0 = ex.prefix_cache.hits
warm = ttft(prompt)
hit_full = ex.prefix_cache.hits - h0
ext = prompt + rng.integers(0, cfg.vocab_size, 2048).tolist()
h1 = ex.prefix_cache.hits
warm_ext = ttft(ext)
hit_ext = ex.prefix_cache.hits - h1
# steady ext: a DIFFERENT tail on the same cached prefix (the first ext
# pays one-time program loads for the longer-prompt shapes)
ext2 = prompt + rng.integers(0, cfg.vocab_size, 2048).tolist()
warm_ext2 = ttft(ext2)
# re-measure warm (first warm pays one-time program loads)
warm2 = ttft(prompt)

handle.shutdown()
print(f"cold TTFT           : {cold:8.1f} ms")
print(f"warm full (hit={hit_full}) : {warm:8.1f} ms  ({cold/warm:.1f}x)")
print(f"warm full 2nd       : {warm2:8.1f} ms  ({cold/warm2:.1f}x)")
print(f"warm +2k tail (hit={hit_ext}): {warm_ext:8.1f} ms  ({cold/warm_ext:.1f}x)")
print(f"warm +2k tail 2nd   : {warm_ext2:8.1f} ms  ({cold/warm_ext2:.1f}x)")
