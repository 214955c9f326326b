"""Prefix cache: shared prompt pages, token parity, refcounts, eviction.

Design: docs/prefix-cache-design.md — the paged layout shares prefixes by
page-table indirection (zero device copies); the pool is refcounted; prefill
of a hit starts at the cached page boundary via the chunked continuation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions,
    Finished,
    GenerateRequest,
    SamplingParams,
    Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.kv import PagePool, PrefixCache
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen3 as q3


# ── unit: pool refcounts + cache mechanics ───────────────────────────────


def test_pool_refcounts():
    pool = PagePool(8)
    pages = pool.alloc(3)
    assert pool.allocated == 3
    pool.incref(pages[:2])
    pool.free(pages)  # drops one ref each: first two survive
    assert pool.allocated == 2
    pool.free(pages[:2])
    assert pool.allocated == 0
    assert pool.available == 7


def test_prefix_cache_match_insert_evict():
    pool = PagePool(32)
    cache = PrefixCache(pool, page_size=4)
    toks = list(range(10))  # 2 full pages + 2 tokens
    st_pages = pool.alloc(3)
    cache.insert(toks, st_pages[:2])
    # same prompt: both full pages hit (cap: last token never cached-over)
    n, pages = cache.match(toks)
    assert n == 8 and pages == st_pages[:2]
    pool.free(pages)  # the match's refs
    # shorter same-prefix prompt: only page 0 usable (cap len-1)
    n, pages = cache.match(list(range(5)))
    assert n == 4 and pages == [st_pages[0]]
    pool.free(pages)
    # diverging second page
    n, pages = cache.match([0, 1, 2, 3, 9, 9, 9, 9, 1])
    assert n == 4
    pool.free(pages)
    # release the request's own refs; cache still holds the pages
    pool.free(st_pages)
    assert pool.allocated == 2
    cache.clear()
    assert pool.allocated == 0


def test_eviction_under_pressure():
    pool = PagePool(6)  # 5 usable
    cache = PrefixCache(pool, page_size=2)
    a = pool.alloc(2)
    cache.insert([1, 2, 3, 4, 5], a)
    pool.free(a)  # only cache refs remain
    # allocating all remaining pages forces LRU eviction of cached pages
    b = pool.alloc(5)
    assert len(b) == 5
    assert cache.hits == 0  # nothing matched, just mechanics


# ── engine-level: token parity + fewer pages prefilled ───────────────────


@pytest.fixture(scope="module")
def engine_and_executor():
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=11, dtype=jnp.float32)
    runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                              kv_dtype=jnp.float32)
    ex = JaxExecutor(runtime, EngineLoadOptions(max_batch_size=8,
                                                prefill_chunk=8))
    handle = start_scheduler(ex)
    yield handle, ex
    handle.shutdown()


def collect(req):
    toks = []
    for ev in req.channel:
        if isinstance(ev, Token):
            toks.append(ev.id)
        elif isinstance(ev, Finished):
            break
    return toks


def test_prefix_hit_token_parity(engine_and_executor):
    engine, ex = engine_and_executor
    assert ex.prefix_cache is not None
    prompt = [7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17]  # 2 full pages + 3

    r1 = GenerateRequest(prompt_tokens=list(prompt), max_tokens=6,
                         params=SamplingParams(ignore_eos=True))
    engine.submit(r1)
    t1 = collect(r1)
    misses_before = ex.prefix_cache.misses
    hits_before = ex.prefix_cache.hits

    r2 = GenerateRequest(prompt_tokens=list(prompt), max_tokens=6,
                         params=SamplingParams(ignore_eos=True))
    engine.submit(r2)
    t2 = collect(r2)
    assert t2 == t1  # identical stream despite skipping the cached prefix
    assert ex.prefix_cache.hits == hits_before + 1
    assert ex.prefix_cache.misses == misses_before

    # divergent suffix, shared first page: still a hit, different tokens ok
    r3 = GenerateRequest(prompt_tokens=list(prompt[:4]) + [99, 98, 97, 96, 95],
                         params=SamplingParams(ignore_eos=True), max_tokens=6)
    engine.submit(r3)
    t3 = collect(r3)
    assert ex.prefix_cache.hits == hits_before + 2
    # parity vs a fresh engine-free reference: resubmit with cache cleared
    ex.prefix_cache.clear()
    r4 = GenerateRequest(prompt_tokens=list(prompt[:4]) + [99, 98, 97, 96, 95],
                         params=SamplingParams(ignore_eos=True), max_tokens=6)
    engine.submit(r4)
    t4 = collect(r4)
    assert t3 == t4


def test_prefix_offset_last_chunk_table_span(engine_and_executor):
    """Regression: a cached-prefix offset can push the last chunk's page
    span past the request's own page count; the table must widen (an
    out-of-range dynamic-slice start CLAMPS in XLA and the chunk would
    silently write the wrong — possibly shared — pages)."""
    engine, ex = engine_and_executor
    # 32 tokens = exactly 8 pages (ps=4) = the pow2 table bucket; prefix
    # offset 28 makes the last chunk span pages [7, 9) > 8
    prompt = list(range(60, 92))
    r1 = GenerateRequest(prompt_tokens=list(prompt), max_tokens=4,
                         params=SamplingParams(ignore_eos=True))
    engine.submit(r1)
    t1 = collect(r1)
    r2 = GenerateRequest(prompt_tokens=list(prompt), max_tokens=4,
                         params=SamplingParams(ignore_eos=True))
    engine.submit(r2)
    t2 = collect(r2)
    # third submission re-checks the SHARED pages survived request 2
    r3 = GenerateRequest(prompt_tokens=list(prompt), max_tokens=4,
                         params=SamplingParams(ignore_eos=True))
    engine.submit(r3)
    t3 = collect(r3)
    assert t1 == t2 == t3


def test_cache_filled_pool_does_not_deadlock_admission():
    """Regression: when the cache holds (nearly) every page, admission must
    count cache-only pages as reclaimable — otherwise a resubmitted prompt
    defers forever (the eviction hook only fires on alloc, which a deferred
    request never reaches)."""
    import threading

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=13, dtype=jnp.float32)
    # pool: null page + 5 pages; prompt takes 4 pages + decode fits page 5
    runtime = q3.make_runtime(cfg, params, num_pages=6, page_size=4)
    ex = JaxExecutor(runtime, EngineLoadOptions(max_batch_size=4,
                                                prefill_chunk=8))
    engine = start_scheduler(ex)
    try:
        prompt = list(range(30, 46))  # 16 tokens = 4 full pages (all cached)
        done = []

        def run_one():
            r = GenerateRequest(prompt_tokens=list(prompt), max_tokens=2,
                                params=SamplingParams(ignore_eos=True))
            engine.submit(r)
            done.append(collect(r))

        for _ in range(2):
            t = threading.Thread(target=run_one)
            t.start()
            t.join(timeout=60)
            assert not t.is_alive(), "request deadlocked in admission"
        assert done[0] == done[1]
    finally:
        engine.shutdown()


def test_fully_cached_prompt_reruns_last_token(engine_and_executor):
    """A prompt whose every full page is cached still prefills >= 1 token
    (the last token's logits drive sampling)."""
    engine, ex = engine_and_executor
    prompt = [21, 22, 23, 24, 25, 26, 27, 28]  # exactly 2 pages
    r1 = GenerateRequest(prompt_tokens=list(prompt), max_tokens=4,
                         params=SamplingParams(ignore_eos=True))
    engine.submit(r1)
    t1 = collect(r1)
    r2 = GenerateRequest(prompt_tokens=list(prompt), max_tokens=4,
                         params=SamplingParams(ignore_eos=True))
    engine.submit(r2)
    t2 = collect(r2)
    assert t1 == t2


def test_differential_random_stream_cache_vs_nocache():
    """Randomized differential test: a stream of requests (with repeated
    and shared-prefix prompts) must produce IDENTICAL greedy tokens with
    the prefix cache on vs off — the cache is a pure optimization."""
    import numpy as np

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=21, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    bases = [rng.integers(2, 127, rng.integers(6, 40)).tolist()
             for _ in range(4)]
    prompts = []
    for _ in range(14):
        b = bases[rng.integers(0, len(bases))]
        cut = int(rng.integers(3, len(b) + 1))
        tail = rng.integers(2, 127, rng.integers(0, 6)).tolist()
        prompts.append(b[:cut] + tail)

    def run(enable_cache):
        runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                                  kv_dtype=jnp.float32)
        ex = JaxExecutor(runtime, EngineLoadOptions(
            max_batch_size=4, prefill_chunk=8,
            enable_prefix_cache=enable_cache))
        engine = start_scheduler(ex)
        outs = []
        try:
            reqs = []
            for i, p in enumerate(prompts):
                r = GenerateRequest(prompt_tokens=list(p),
                                    max_tokens=4 + (i % 5),
                                    params=SamplingParams(ignore_eos=True))
                engine.submit(r)
                reqs.append(r)
                if i % 3 == 2:  # drain some before submitting more
                    outs.append(collect(reqs.pop(0)))
            outs.extend(collect(r) for r in reqs)
        finally:
            engine.shutdown()
        return outs

    assert run(True) == run(False)
