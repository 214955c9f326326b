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


def test_hybrid_match_only_at_snapshot_boundaries():
    """Stateful-model matching: a prefix is only usable where a state
    snapshot exists, even when deeper pages are cached."""
    pool = PagePool(32)
    cache = PrefixCache(pool, page_size=4)
    toks = list(range(20))  # 5 full pages
    pages = pool.alloc(5)
    cache.insert(toks, pages)
    # no snapshot anywhere -> no hybrid match (but a plain match succeeds)
    n, p, snap = cache.match_hybrid(toks + [77])
    assert (n, p, snap) == (0, [], None)
    # snapshot at pos 8 (page 2 boundary)
    cache.insert_snapshot(toks, 8, {"s": "at8"})
    n, p, snap = cache.match_hybrid(toks + [77])
    assert n == 8 and p == pages[:2] and snap == {"s": "at8"}
    pool.free(p)
    # deeper snapshot wins
    cache.insert_snapshot(toks, 16, {"s": "at16"})
    n, p, snap = cache.match_hybrid(toks + [77])
    assert n == 16 and snap == {"s": "at16"}
    pool.free(p)
    # identical prompt (len 20): usable cap is (20-1)//4 = 4 pages -> the
    # pos-16 snapshot is exactly usable
    n, p, snap = cache.match_hybrid(toks)
    assert n == 16
    pool.free(p)
    # misaligned / out-of-range snapshot positions are ignored
    cache.insert_snapshot(toks, 7, {"s": "bad"})
    cache.insert_snapshot(toks, 24, {"s": "bad"})
    assert len(cache._snaps) == 2


def test_hybrid_snapshot_lru_cap():
    pool = PagePool(64)
    cache = PrefixCache(pool, page_size=4, max_snapshots=2)
    toks = list(range(40))
    pages = pool.alloc(10)
    cache.insert(toks, pages)
    cache.insert_snapshot(toks, 8, {"s": 8})
    cache.insert_snapshot(toks, 16, {"s": 16})
    cache.insert_snapshot(toks, 24, {"s": 24})  # evicts pos-8 (LRU)
    assert sorted(pos for pos, _ in cache._snaps.values()) == [16, 24]
    # matching refreshes LRU order: touch 16, then insert -> 24 evicted
    n, p, snap = cache.match_hybrid(toks[:17] + [99])
    assert n == 16
    pool.free(p)
    cache.insert_snapshot(toks, 32, {"s": 32})
    assert sorted(pos for pos, _ in cache._snaps.values()) == [16, 32]


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


def _tiny_qwen35():
    """Tiny random-weight hybrid model (1 linear + 1 full layer)."""
    import torch
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    from pegainfer_tpu.models import qwen35 as q35

    hf = Qwen3NextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25, tie_word_embeddings=True,
        max_position_embeddings=2048,
        layer_types=["linear_attention", "full_attention"],
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=0, attn_implementation="eager",
    )
    torch.manual_seed(5)
    model = Qwen3NextForCausalLM(hf).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = q35.Qwen35Config.from_hf(hf)
    return cfg, q35.params_from_state_dict(cfg, sd, dtype=jnp.float32)


def _qwen35_engine(cfg, params, enable_cache=True):
    from pegainfer_tpu.models import qwen35 as q35

    runtime = q35.make_runtime(cfg, params, num_pages=128, page_size=4,
                               max_slots=4, kv_dtype=jnp.float32,
                               use_pallas=False)
    ex = JaxExecutor(runtime, EngineLoadOptions(
        prefill_chunk=16, enable_prefix_cache=enable_cache))
    return start_scheduler(ex), ex


def test_hybrid_prefix_cache_qwen35_token_parity():
    """Qwen3.5 prefix reuse: GDN/conv state snapshots at the chunk boundary
    make cached prefixes usable despite position-dependent state — tokens
    must be identical to the cold path (VERDICT #6; the reference carries
    this as a design doc only, prefix-paged-kv-pd-handoff.md)."""
    cfg, params = _tiny_qwen35()
    engine, ex = _qwen35_engine(cfg, params)
    try:
        assert ex.prefix_cache is not None and ex._hybrid_cache
        rng = np.random.default_rng(7)
        prompt = rng.integers(2, 255, 45).tolist()  # 3 chunks of 16

        def run(p, n=6):
            r = GenerateRequest(prompt_tokens=list(p), max_tokens=n,
                                params=SamplingParams(ignore_eos=True))
            engine.submit(r)
            return collect(r)

        t1 = run(prompt)
        hits0 = ex.prefix_cache.hits
        t2 = run(prompt)  # identical prompt -> snapshot boundary hit
        assert t2 == t1
        assert ex.prefix_cache.hits == hits0 + 1

        # extended prompt (multi-turn shape): shares the cached prefix
        ext = prompt + rng.integers(2, 255, 20).tolist()
        t3 = run(ext)
        assert ex.prefix_cache.hits == hits0 + 2
        # cold reference for the extended prompt
        ex.prefix_cache.clear()
        t4 = run(ext)
        assert t3 == t4
    finally:
        engine.shutdown()


def test_hybrid_page_aligned_end_snapshot():
    """A page-aligned prompt end is snapshotted too, so an extended prompt
    resumes from the full previous prompt (the multi-turn case)."""
    cfg, params = _tiny_qwen35()
    engine, ex = _qwen35_engine(cfg, params)
    try:
        rng = np.random.default_rng(9)
        prompt = rng.integers(2, 255, 32).tolist()  # 2 chunks, end aligned

        def run(p, n=4):
            r = GenerateRequest(prompt_tokens=list(p), max_tokens=n,
                                params=SamplingParams(ignore_eos=True))
            engine.submit(r)
            return collect(r)

        run(prompt)
        # snapshots: deepest interior boundary (16) + aligned end (32)
        assert sorted(pos for pos, _ in ex.prefix_cache._snaps.values()) \
            == [16, 32]
        ext = prompt + rng.integers(2, 255, 12).tolist()
        hits0 = ex.prefix_cache.hits
        t1 = run(ext)
        assert ex.prefix_cache.hits == hits0 + 1
        ex.prefix_cache.clear()
        t2 = run(ext)
        assert t1 == t2
    finally:
        engine.shutdown()


def test_hybrid_fine_tail_snapshot_depth():
    """With the hybrid cache on, the prompt's final stretch runs in small
    chunks so the deepest snapshot lands within `small` tokens of the end
    (warm TTFT floor ≈ small, not a whole chunk)."""
    from pegainfer_tpu.models import qwen35 as q35

    cfg, params = _tiny_qwen35()
    runtime = q35.make_runtime(cfg, params, num_pages=512, page_size=4,
                               max_slots=4, kv_dtype=jnp.float32,
                               use_pallas=False)
    ex = JaxExecutor(runtime, EngineLoadOptions(prefill_chunk=512))
    engine = start_scheduler(ex)
    try:
        rng = np.random.default_rng(23)
        prompt = rng.integers(2, 255, 900).tolist()

        def run(p, n=3):
            r = GenerateRequest(prompt_tokens=list(p), max_tokens=n,
                                params=SamplingParams(ignore_eos=True))
            engine.submit(r)
            return collect(r)

        t1 = run(prompt)
        # pieces: (512, 512), (256, 644), (256, 900) -> deepest interior
        # snapshot at 644 = ceil((900-256)/4)*4, plus the aligned end 900
        assert sorted(pos for pos, _ in ex.prefix_cache._snaps.values()) \
            == [644, 900]
        hits0 = ex.prefix_cache.hits
        t2 = run(prompt)
        assert t2 == t1 and ex.prefix_cache.hits == hits0 + 1
    finally:
        engine.shutdown()


def test_hybrid_differential_random_stream():
    """Differential: hybrid engine with cache on vs off over a stream of
    shared-prefix prompts — identical greedy tokens (cache is pure opt)."""
    cfg, params = _tiny_qwen35()
    rng = np.random.default_rng(17)
    bases = [rng.integers(2, 255, rng.integers(20, 60)).tolist()
             for _ in range(3)]
    prompts = []
    for _ in range(10):
        b = bases[rng.integers(0, len(bases))]
        cut = int(rng.integers(8, len(b) + 1))
        tail = rng.integers(2, 255, rng.integers(0, 8)).tolist()
        prompts.append(b[:cut] + tail)

    def run(enable_cache):
        engine, _ = _qwen35_engine(cfg, params, enable_cache)
        outs = []
        try:
            for i, p in enumerate(prompts):
                r = GenerateRequest(prompt_tokens=list(p),
                                    max_tokens=3 + (i % 4),
                                    params=SamplingParams(ignore_eos=True))
                engine.submit(r)
                outs.append(collect(r))
        finally:
            engine.shutdown()
        return outs

    assert run(True) == run(False)


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


# ── DSv4 slot prefix cache (page-less models) ────────────────────────────
# DSv4 has no paged KV: a cached prefix is a whole-slot state snapshot
# (kv.SlotPrefixCache) and a hit resumes the suffix through the scanned
# decode recurrence (dsv4.prefill_resume_grouped). See
# docs/prefix-cache-design.md.


def test_slot_prefix_cache_match_insert_evict():
    from pegainfer_tpu.engine.kv import SlotPrefixCache

    c = SlotPrefixCache(max_entries=2)
    assert c.match([1, 2, 3]) is None
    c.insert([1, 2], snap="s12", logits=None)
    # extension hit
    pos, snap, logits = c.match([1, 2, 9])
    assert (pos, snap, logits) == (2, "s12", None)
    # identical prompt without logits is unusable (no forward left)
    assert c.match([1, 2]) is None
    # logits upgrade on re-insert keeps the entry usable for exact hits
    c.insert([1, 2], snap="s12b", logits="L")
    assert c.match([1, 2]) == (2, "s12b", "L")
    # longest prefix wins
    c.insert([1, 2, 9], snap="s129", logits=None)
    assert c.match([1, 2, 9, 4])[0] == 3
    # LRU eviction at cap (cap 2: [1,2,9] was refreshed by the match above,
    # so the stale [1,2] entry is the one dropped)
    c.insert([7, 7, 7], snap="s777", logits=None)
    assert c.match([1, 2]) is None  # evicted (oldest)
    assert c.match([1, 2, 9, 4])[0] == 3
    assert c.match([7, 7, 7, 1])[0] == 3


def _dsv4_prefill(ex, rid, prompt):
    from pegainfer_tpu.engine.executor import PrefillPlan
    from pegainfer_tpu.engine.executor import PrefillStepItem

    item = PrefillStepItem(request_id=rid, prompt_tokens=list(prompt),
                           params=SamplingParams(ignore_eos=True))
    return ex.execute_prefill(PrefillPlan(requests=[item])).requests[0]


def test_dsv4_slot_prefix_token_parity():
    """A prompt extending a cached one resumes from the snapshot and
    produces the exact cold-path token stream."""
    from tests.test_pd_handoff import _make_dsv4, decode_n

    make = _make_dsv4()
    rng = np.random.default_rng(9)
    base = rng.integers(2, 127, 24).tolist()
    full = base + rng.integers(2, 127, 4).tolist()

    cold = make(enable_prefix_cache=False)
    r = _dsv4_prefill(cold, 1, full)
    want = decode_n(cold, 1, r.first_token, 6)

    warm = make(enable_prefix_cache=True)
    assert warm.slot_prefix_cache is not None
    _dsv4_prefill(warm, 1, base)  # populates the cache
    warm.release_request(1)
    r2 = _dsv4_prefill(warm, 2, full)
    assert warm.slot_prefix_cache.hits == 1  # served via resume
    got = decode_n(warm, 2, r2.first_token, 6)
    assert got == want


def test_dsv4_identical_prompt_skips_forward():
    """An exact repeat of a cached prompt reuses the stored prompt-end
    logits (no forward at all) and still decodes identically."""
    from tests.test_pd_handoff import _make_dsv4, decode_n

    make = _make_dsv4()
    rng = np.random.default_rng(10)
    prompt = rng.integers(2, 127, 20).tolist()

    ex = make(enable_prefix_cache=True)
    # logprobs>0 routes through the logits (non-fused) prefill path, which
    # stores the prompt-end logits alongside the snapshot
    from pegainfer_tpu.engine.executor import PrefillPlan
    from pegainfer_tpu.engine.executor import PrefillStepItem

    item = PrefillStepItem(request_id=1, prompt_tokens=list(prompt),
                           params=SamplingParams(ignore_eos=True), logprobs=1)
    r1 = ex.execute_prefill(PrefillPlan(requests=[item])).requests[0]
    want = decode_n(ex, 1, r1.first_token, 5)
    ex.release_request(1)

    r2 = _dsv4_prefill(ex, 2, prompt)
    assert ex.slot_prefix_cache.hits == 1
    got = decode_n(ex, 2, r2.first_token, 5)
    assert got == want


def test_dsv4_long_suffix_falls_back_to_prefill():
    """A suffix past the resume threshold is NOT served at decode rate —
    the request prefills from scratch (and re-caches its own prompt)."""
    from tests.test_pd_handoff import _make_dsv4

    make = _make_dsv4()
    rng = np.random.default_rng(11)
    base = rng.integers(2, 127, 8).tolist()
    # suffix 40 > max(32, 48 // 16) — beyond the resume threshold
    full = base + rng.integers(2, 127, 40).tolist()

    ex = make(enable_prefix_cache=True)
    _dsv4_prefill(ex, 1, base)
    ex.release_request(1)
    r = _dsv4_prefill(ex, 2, full)
    assert ex.slot_prefix_cache.hits == 1  # matched ...
    assert r.first_token is not None  # ... but served by the normal path

    cold = make(enable_prefix_cache=False)
    r_cold = _dsv4_prefill(cold, 1, full)
    assert r.first_token == r_cold.first_token
