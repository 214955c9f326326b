"""Page pool + KV state + admission tests.

Semantics mirrored from the reference in-file tests
(pegainfer-core/src/page_pool.rs:124-199, kv_pool.rs:280-380) and the
admission rules (pegainfer-qwen3-4b/src/scheduler.rs:185-254).
"""

from dataclasses import dataclass

import pytest

from pegainfer_tpu.engine.kv import (
    AdmissionOutcome,
    KvAccounting,
    KvState,
    PagePool,
    admit_deferred_requests,
    max_request_tokens,
    pages_needed,
)


def test_pages_needed():
    assert pages_needed(0, 16) == 0
    assert pages_needed(1, 16) == 1
    assert pages_needed(16, 16) == 1
    assert pages_needed(17, 16) == 2


def test_pool_alloc_free_roundtrip():
    pool = PagePool(num_pages=8)
    assert pool.available == 7  # null page reserved
    pages = pool.alloc(3)
    assert len(set(pages)) == 3
    assert PagePool.NULL_PAGE not in pages
    assert pool.available == 4
    pool.free(pages)
    assert pool.available == 7


def test_pool_exhaustion_raises():
    pool = PagePool(num_pages=4)
    pool.alloc(3)
    with pytest.raises(RuntimeError):
        pool.alloc(1)


def test_pool_never_hands_out_null_page():
    pool = PagePool(num_pages=16)
    pages = pool.alloc(15)
    assert PagePool.NULL_PAGE not in pages
    with pytest.raises(ValueError):
        pool.free([PagePool.NULL_PAGE])


def test_kv_state_grow_advance_release():
    pool = PagePool(num_pages=16)
    st = KvState(page_size=4)
    st.ensure_capacity(pool, 5)
    assert len(st.pages) == 2 and st.capacity == 8
    st.advance(5)
    assert st.length == 5
    # growing to a size already covered is a no-op
    st.ensure_capacity(pool, 8)
    assert len(st.pages) == 2
    st.ensure_capacity(pool, 9)
    assert len(st.pages) == 3
    with pytest.raises(RuntimeError):
        st.advance(100)
    st.release(pool)
    assert pool.available == 15 and st.length == 0


def test_kv_accounting_release():
    pool = PagePool(num_pages=16)
    acc = KvAccounting(pool, page_size=4)
    st = acc.state(7)
    st.ensure_capacity(pool, 10)
    assert pool.available < 15
    acc.release(7)
    assert pool.available == 15
    acc.release(7)  # idempotent


@dataclass
class Req:
    prompt_len: int
    max_tokens: int
    generated_count: int = 0


def test_max_request_tokens_excludes_last_sampled_token():
    # prefill samples a token without storing it in KV: N completions occupy N-1 slots
    assert max_request_tokens(10, 1) == 10
    assert max_request_tokens(10, 5) == 14


def test_admission_rejects_impossible_requests():
    out = admit_deferred_requests(
        deferred=[Req(prompt_len=100, max_tokens=1)],
        active=[],
        page_size=4,
        available_pages=1000,
        max_request_pages=10,
    )
    assert len(out.rejected) == 1 and not out.pending and not out.deferred


def test_admission_defers_under_pressure_fcfs():
    # 10 pages free; req A needs 8, req B needs 8 → A admitted, B deferred
    reqs = [Req(prompt_len=30, max_tokens=3), Req(prompt_len=30, max_tokens=3)]
    out = admit_deferred_requests(reqs, [], page_size=4, available_pages=10, max_request_pages=100)
    assert len(out.pending) == 1 and len(out.deferred) == 1
    assert out.pending[0] is reqs[0]


def test_admission_reserves_active_future_growth():
    # active request: prompt 4, max 9 → lifetime 12 tokens = 3 pages;
    # currently at 4+0 = 4 tokens = 1 page → future growth = 2 pages.
    active = [Req(prompt_len=4, max_tokens=9, generated_count=1)]
    # 4 pages free, minus 2 future = budget 2. New req needs 2 pages → admitted.
    out = admit_deferred_requests(
        [Req(prompt_len=8, max_tokens=1)], active, 4, available_pages=4, max_request_pages=100
    )
    assert len(out.pending) == 1
    # New req needs 3 pages → deferred (would deadlock decode otherwise).
    out = admit_deferred_requests(
        [Req(prompt_len=12, max_tokens=1)], active, 4, available_pages=4, max_request_pages=100
    )
    assert len(out.deferred) == 1 and not out.pending
