"""Scheduler tests against a FakeExecutor (no TPU).

The FakeExecutor pattern mirrors the reference's hardware-free scheduler
harness (pegainfer-qwen3-4b/src/scheduler.rs:343-733): it simulates KV page
accounting and can inject decode failures.
"""

import threading
import time

from pegainfer_tpu.engine.contract import (
    EngineHandle,
    Error,
    Finished,
    FinishReason,
    GenerateRequest,
    Rejected,
    SamplingParams,
    Scheduled,
    Token,
    TokenChannel,
    is_terminal,
)
from pegainfer_tpu.engine.executor import (
    DecodePlan,
    DecodeRequestResult,
    DecodeResult,
    PrefillPlan,
    PrefillRequestResult,
    PrefillResult,
    UnifiedPlan,
    UnifiedResult,
)
from pegainfer_tpu.engine.kv import KvAccounting, PagePool
from pegainfer_tpu.engine.scheduler import Scheduler, start_scheduler

EOS = 99


class FakeExecutor:
    """Emits token_id = prompt[-1]+1, +1 per decode step. Tracks KV pages."""

    def __init__(self, num_pages=64, page_size=4, max_req_pages=32,
                 decode_failures=0, unified_calls=None):
        self.pool = PagePool(num_pages=num_pages + 1)  # +1 for the null page
        self.kv = KvAccounting(self.pool, page_size)
        self._page_size = page_size
        self._max_req_pages = max_req_pages
        self._decode_failures = decode_failures
        self.plans = []

    def page_size(self):
        return self._page_size

    def available_pages(self):
        return self.pool.available

    def max_request_pages(self):
        return self._max_req_pages

    def is_stop_token(self, t):
        return t == EOS

    def _do_prefill(self, items):
        out = []
        for it in items:
            st = self.kv.state(it.request_id)
            st.ensure_capacity(self.kv.pool, len(it.prompt_tokens))
            st.advance(len(it.prompt_tokens))
            out.append(
                PrefillRequestResult(
                    request_id=it.request_id,
                    first_token=it.prompt_tokens[-1] + 1,
                )
            )
        return out

    def _do_decode(self, items):
        if self._decode_failures > 0:
            self._decode_failures -= 1
            raise RuntimeError("injected decode failure")
        out = []
        for it in items:
            st = self.kv.state(it.request_id)
            st.ensure_capacity(self.kv.pool, st.length + 1)
            st.advance(1)
            out.append(DecodeRequestResult(request_id=it.request_id, token=it.token_id + 1))
        return out

    def execute_prefill(self, plan: PrefillPlan) -> PrefillResult:
        self.plans.append("prefill")
        return PrefillResult(requests=self._do_prefill(plan.requests))

    def execute_decode(self, plan: DecodePlan) -> DecodeResult:
        self.plans.append("decode")
        return DecodeResult(requests=self._do_decode(plan.requests))

    def execute_unified(self, plan: UnifiedPlan) -> UnifiedResult:
        self.plans.append("unified")
        decode = self._do_decode(plan.decode_requests)
        prefill = self._do_prefill(plan.prefill_requests)
        return UnifiedResult(prefill_requests=prefill, decode_requests=decode)

    def release_request(self, request_id):
        self.kv.release(request_id)


def submit(handle, prompt, max_tokens, **kw):
    ch = TokenChannel()
    handle.submit(GenerateRequest(prompt_tokens=prompt, max_tokens=max_tokens, channel=ch, **kw))
    return ch


def collect(ch, timeout=5.0):
    events = []
    deadline = time.time() + timeout
    for ev in ch:
        events.append(ev)
        if is_terminal(ev) or time.time() > deadline:
            break
    return events


def run_until_idle(sched: Scheduler, max_steps=1000):
    """Drive the scheduler loop synchronously (no thread)."""
    for _ in range(max_steps):
        reqs, _ = sched.handle._drain()
        for r in reqs:
            sched._ingest(r)
        sched._drop_closed_channels()
        if not sched.step() and not sched.deferred:
            return
    raise AssertionError("scheduler did not go idle")


def make_sched(**kw):
    ex = FakeExecutor(**kw)
    handle = EngineHandle()
    return ex, Scheduler(ex, handle), handle


def test_basic_generation_token_sequence():
    ex, sched, handle = make_sched()
    ch = submit(handle, [1, 2, 3], 4)
    run_until_idle(sched)
    events = collect(ch)
    assert isinstance(events[0], Scheduled)
    toks = [e.id for e in events if isinstance(e, Token)]
    assert toks == [4, 5, 6, 7]
    fin = events[-1]
    assert isinstance(fin, Finished) and fin.finish_reason == FinishReason.LENGTH
    assert fin.prompt_tokens == 3 and fin.completion_tokens == 4
    assert ex.pool.available == ex.pool.num_pages - 1  # all KV released


def test_eos_stops_generation():
    ex, sched, handle = make_sched()
    ch = submit(handle, [EOS - 2], 10)  # tokens: 98, then 99=EOS
    run_until_idle(sched)
    events = collect(ch)
    toks = [e.id for e in events if isinstance(e, Token)]
    assert toks == [EOS - 1]
    assert events[-1].finish_reason == FinishReason.STOP
    assert events[-1].completion_tokens == 2


def test_ignore_eos_runs_to_length():
    ex, sched, handle = make_sched()
    ch = submit(handle, [EOS - 2], 5, params=SamplingParams(ignore_eos=True))
    run_until_idle(sched)
    toks = [e.id for e in collect(ch) if isinstance(e, Token)]
    assert len(toks) == 5


def test_max_tokens_one_finishes_after_prefill():
    ex, sched, handle = make_sched()
    ch = submit(handle, [5, 6], 1)
    run_until_idle(sched)
    events = collect(ch)
    toks = [e.id for e in events if isinstance(e, Token)]
    assert toks == [7]
    assert events[-1].finish_reason == FinishReason.LENGTH
    assert ex.plans == ["prefill"]


def test_rejection_of_oversized_request():
    ex, sched, handle = make_sched(max_req_pages=2)  # max 8 tokens lifetime
    ch = submit(handle, list(range(20)), 5)
    run_until_idle(sched)
    events = collect(ch)
    assert len(events) == 1 and isinstance(events[0], Rejected)


def test_deferral_under_kv_pressure_then_admission():
    # pool: 8 usable pages of 4 tokens. Each request: prompt 16 + 9 tokens
    # lifetime = 24 tokens = 6 pages. Two requests can't fit together.
    ex, sched, handle = make_sched(num_pages=8)
    ch1 = submit(handle, list(range(16)), 10)
    ch2 = submit(handle, list(range(16)), 10)
    run_until_idle(sched)
    ev1, ev2 = collect(ch1), collect(ch2)
    for evs in (ev1, ev2):
        toks = [e.id for e in evs if isinstance(e, Token)]
        assert len(toks) == 10
        assert evs[-1].finish_reason == FinishReason.LENGTH
    # second request was deferred, not rejected, and admitted after the first finished
    assert ex.pool.available == 8


def test_unified_plan_used_when_prefill_arrives_mid_decode():
    ex, sched, handle = make_sched()
    ch1 = submit(handle, [1], 5)
    # step 1: prefill req A
    reqs, _ = sched.handle._drain()
    for r in reqs:
        sched._ingest(r)
    sched.step()
    assert ex.plans == ["prefill"]
    # req B arrives while A decodes → unified
    ch2 = submit(handle, [10], 3)
    reqs, _ = sched.handle._drain()
    for r in reqs:
        sched._ingest(r)
    sched.step()
    assert ex.plans == ["prefill", "unified"]
    run_until_idle(sched)
    assert [e.id for e in collect(ch1) if isinstance(e, Token)] == [2, 3, 4, 5, 6]
    assert [e.id for e in collect(ch2) if isinstance(e, Token)] == [11, 12, 13]


def test_decode_failure_errors_touched_requests_and_recovers():
    ex, sched, handle = make_sched(decode_failures=1)
    ch1 = submit(handle, [1], 5)
    run_until_idle(sched)
    events = collect(ch1)
    assert isinstance(events[-1], Error)
    assert ex.pool.available == ex.pool.num_pages - 1  # KV dropped
    # engine keeps serving
    ch2 = submit(handle, [1], 3)
    run_until_idle(sched)
    assert [e.id for e in collect(ch2) if isinstance(e, Token)] == [2, 3, 4]


def test_receiver_drop_retires_request():
    ex, sched, handle = make_sched()
    ch = submit(handle, [1], 100)
    reqs, _ = sched.handle._drain()
    for r in reqs:
        sched._ingest(r)
    sched.step()  # prefill
    sched.step()  # a decode step
    assert sched.active
    ch.close()
    sched._drop_closed_channels()
    assert not sched.active
    assert ex.pool.available == ex.pool.num_pages - 1


def test_threaded_scheduler_end_to_end():
    ex = FakeExecutor()
    handle = start_scheduler(ex)
    chs = [submit(handle, [i], 4) for i in range(8)]
    for i, ch in enumerate(chs):
        toks = [e.id for e in collect(ch) if isinstance(e, Token)]
        assert toks == [i + 1, i + 2, i + 3, i + 4]
    handle.shutdown()
    handle._thread.join(timeout=5)
    assert not handle._thread.is_alive()


class ChunkableFakeExecutor(FakeExecutor):
    """Has the real executor's chunked-prefill surface so the unified plan
    takes the interleaved path, but reports every prompt as non-chunkable
    (the echo+logprobs case, which needs all-position logits in one pass)."""

    def supports_chunked_prefill(self, item):
        return False

    def prefill_stepper(self, item):  # pragma: no cover - must not be hit
        raise AssertionError("non-chunkable prompts must not use the stepper")


def test_unified_nonchunkable_prefill_interleaves_decode():
    """A non-chunkable (echo-style) prefill queue must not stall active
    decodes for the whole queue: decode blocks run between per-request
    prefills (reference bound: the fused unified pass,
    unified_forward.rs:1-78)."""
    ex = ChunkableFakeExecutor()
    handle = EngineHandle()
    sched = Scheduler(ex, handle)
    ch_a = submit(handle, [1], 30, params=SamplingParams(ignore_eos=True))
    reqs, _ = sched.handle._drain()
    for r in reqs:
        sched._ingest(r)
    sched.step()
    assert ex.plans == ["prefill"]

    # two long non-chunkable prompts arrive while A decodes
    ch_b = submit(handle, [10], 2, params=SamplingParams(ignore_eos=True))
    ch_c = submit(handle, [20], 2, params=SamplingParams(ignore_eos=True))
    reqs, _ = sched.handle._drain()
    for r in reqs:
        sched._ingest(r)
    sched.step()
    # each pending request prefills ALONE with a decode block after it —
    # A makes progress between B's and C's prefills
    assert ex.plans[1:5] == ["prefill", "decode", "prefill", "decode"]
    run_until_idle(sched)
    assert len([e for e in collect(ch_a) if isinstance(e, Token)]) == 30
    assert len([e for e in collect(ch_b) if isinstance(e, Token)]) == 2
    assert len([e for e in collect(ch_c) if isinstance(e, Token)]) == 2


class MixedFusedFakeExecutor(FakeExecutor):
    """Implements the fused mixed-step interface (prefill_stepper +
    mixed_items/mixed_pending + resolve_pending_multi) with scripted decode
    tokens, so the speculative one-piece-deep resolve pipeline can be
    driven deterministically without hardware."""

    def __init__(self, n_chunks=3, decode_tokens=(EOS, 51, 52, 53), **kw):
        super().__init__(**kw)
        self.n_chunks = n_chunks
        self._script = list(decode_tokens)
        self._script_i = 0
        self.decode_active = False
        self.mixed_items = None
        self.mixed_rand = None
        self.mixed_pending = None

    def supports_chunked_prefill(self, item):
        return True

    def supports_mixed_step(self, items):
        return True

    def prefill_stepper(self, item):
        st = self.kv.state(item.request_id)
        n = len(item.prompt_tokens)
        for _ in range(self.n_chunks):
            if self.mixed_items is not None:
                items, self.mixed_items = self.mixed_items, None
                results = []
                for it in items:
                    dst = self.kv.state(it.request_id)
                    dst.ensure_capacity(self.kv.pool, dst.length + 1)
                    dst.advance(1)
                    tok = self._script[min(self._script_i,
                                           len(self._script) - 1)]
                    self._script_i += 1
                    results.append((it.request_id, [tok], None))

                class _Piece:
                    pass

                piece = _Piece()
                piece.items = items
                piece.results = results
                self.mixed_pending = piece
            yield
        st.ensure_capacity(self.kv.pool, n)
        st.advance(n)
        return PrefillRequestResult(
            request_id=item.request_id,
            first_token=item.prompt_tokens[-1] + 1,
        )

    def resolve_pending_multi(self, piece):
        return piece.results


def test_mixed_fused_eos_midstream_discards_speculative_rows():
    """Regression (ADVICE r4 high): a decode stream that EOS-finishes when
    piece k is applied must not crash the resolve of speculative piece k+1
    (which still carries a row for it); the row is discarded and serving
    continues — mirroring _decode_pipelined's live-id filter."""
    ex = MixedFusedFakeExecutor(n_chunks=3, decode_tokens=(EOS, 51, 52))
    handle = EngineHandle()
    sched = Scheduler(ex, handle)

    # A prefills and starts decoding
    ch_a = submit(handle, [10], 10)
    reqs, _ = sched.handle._drain()
    for r in reqs:
        sched._ingest(r)
    sched.step()

    # B's chunked prefill arrives; A's FIRST fused mixed token is EOS, so
    # A finishes while the next speculative piece (with an A row) is in
    # flight — the old code KeyError'd in flush_prev and step-failed both
    ch_b = submit(handle, [20, 21, 22], 1)
    run_until_idle(sched)

    ev_a = collect(ch_a)
    ev_b = collect(ch_b)
    assert not [e for e in ev_a if isinstance(e, Error)]
    assert not [e for e in ev_b if isinstance(e, Error)]
    toks_a = [e.id for e in ev_a if isinstance(e, Token)]
    assert toks_a == [11]  # prefill token only; first mixed token was EOS
    assert isinstance(ev_a[-1], Finished)
    assert ev_a[-1].finish_reason == FinishReason.STOP
    assert isinstance(ev_b[-1], Finished)
    assert [e.id for e in ev_b if isinstance(e, Token)] == [23]
    assert ex.pool.available == ex.pool.num_pages - 1  # all KV released


def test_mixed_fused_eos_on_trailing_piece_drain():
    """EOS applied by the finally-drain's flush_prev while the trailing
    mixed_pending (dispatched right before StopIteration) still has a row
    for the finished stream: the drain must discard it, not crash."""
    ex = MixedFusedFakeExecutor(n_chunks=2, decode_tokens=(EOS, 51))
    handle = EngineHandle()
    sched = Scheduler(ex, handle)

    ch_a = submit(handle, [10], 10)
    reqs, _ = sched.handle._drain()
    for r in reqs:
        sched._ingest(r)
    sched.step()

    ch_b = submit(handle, [20, 21], 1)
    run_until_idle(sched)

    ev_a = collect(ch_a)
    ev_b = collect(ch_b)
    assert not [e for e in ev_a if isinstance(e, Error)]
    assert not [e for e in ev_b if isinstance(e, Error)]
    assert ev_a[-1].finish_reason == FinishReason.STOP
    assert isinstance(ev_b[-1], Finished)
    assert ex.pool.available == ex.pool.num_pages - 1
