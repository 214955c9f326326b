"""Continuous-batching scheduler: FCFS with full-lifetime KV admission.

Semantics ported from the reference scheduler
(pegainfer-qwen3-4b/src/scheduler.rs:97-341 and scheduler/{plan,resolve,
effects}.rs): a single host thread drains submissions, admits under the KV
page budget, builds a Prefill | Decode | Unified plan, executes it on the
ModelExecutor, resolves outcomes (EOS / length / promote / continue) and
applies effects (emit TokenEvents, drop finished KV). On executor failure
every touched request gets TokenEvent.Error and its KV dropped; serving
continues (reference scheduler.rs:160-171, 307-327).
"""

from __future__ import annotations

import logging
import random
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional

from pegainfer_tpu.engine import kv as kvmod
from pegainfer_tpu.engine.contract import (
    EngineHandle,
    Error,
    Finished,
    FinishReason,
    GenerateRequest,
    PromptTokens,
    Rejected,
    SamplingParams,
    Scheduled,
    Token,
    TokenChannel,
)
from pegainfer_tpu.engine.executor import (
    DecodePlan,
    DecodeStepItem,
    ModelExecutor,
    PrefillPlan,
    PrefillStepItem,
    UnifiedPlan,
)

log = logging.getLogger("pegainfer.scheduler")


@dataclass
class PendingRequest:
    request_id: int
    prompt_tokens: List[int]
    params: SamplingParams
    max_tokens: int
    channel: TokenChannel
    logprobs: int = 0
    echo: bool = False
    queued_at_unix_s: float = 0.0

    @property
    def prompt_len(self) -> int:
        return len(self.prompt_tokens)


@dataclass
class ActiveRequestState:
    request_id: int
    channel: TokenChannel
    last_token: int
    generated_count: int
    max_tokens: int
    prompt_len: int
    params: SamplingParams
    logprobs: int = 0


@dataclass
class _FailureTarget:
    request_id: int
    channel: TokenChannel
    prompt_tokens: int
    completion_tokens: int


def build_next_plan(have_active: bool, pending: List[PendingRequest]) -> Optional[str]:
    if pending and have_active:
        return "unified"
    if pending:
        return "prefill"
    if have_active:
        return "decode"
    return None


class Scheduler:
    """Owns the step loop. Create via ``start_scheduler``."""

    def __init__(self, executor: ModelExecutor, handle: EngineHandle, seed: int = 42):
        self.executor = executor
        self.handle = handle
        self.rng = random.Random(seed)
        self.active: List[ActiveRequestState] = []
        self.deferred: List[PendingRequest] = []
        self._next_request_id = 0
        self._stop = threading.Event()

    # ── request intake ───────────────────────────────────────────────

    def _ingest(self, req: GenerateRequest) -> None:
        self.deferred.append(
            PendingRequest(
                request_id=self._next_request_id,
                prompt_tokens=list(req.prompt_tokens),
                params=req.params,
                max_tokens=req.max_tokens,
                channel=req.channel,
                logprobs=req.logprobs,
                echo=req.echo,
                queued_at_unix_s=req.queued_at_unix_s or time.time(),
            )
        )
        self._next_request_id += 1

    # ── main loop ────────────────────────────────────────────────────

    def run(self) -> None:
        log.info("scheduler ready")
        while not self._stop.is_set():
            reqs, still_open = self.handle._drain()
            for r in reqs:
                self._ingest(r)
            if not still_open:
                break

            if not self.active and not self.deferred:
                req, still_open = self.handle._recv_blocking(timeout=0.1)
                if not still_open:
                    break
                if req is None:
                    continue
                self._ingest(req)
                more, still_open = self.handle._drain()
                for r in more:
                    self._ingest(r)
                if not still_open:
                    break

            self._drop_closed_channels()
            if not self.step():
                continue
        log.info("scheduler exiting")
        self.executor_release_all()

    def executor_release_all(self) -> None:
        for st in self.active:
            self.executor.release_request(st.request_id)
        self.active.clear()

    def _drop_closed_channels(self) -> None:
        """Receiver-drop retires requests (reference e2e.rs:193-214)."""
        keep = []
        for st in self.active:
            if st.channel.is_closed:
                self.executor.release_request(st.request_id)
            else:
                keep.append(st)
        self.active = keep
        self.deferred = [r for r in self.deferred if not r.channel.is_closed]

    def step(self) -> bool:
        """One plan→execute→resolve→apply cycle. Returns False when idle."""
        outcome = kvmod.admit_deferred_requests(
            self.deferred,
            self.active,
            self.executor.page_size(),
            self.executor.available_pages(),
            self.executor.max_request_pages(),
        )
        for req in outcome.rejected:
            self._send_rejection(req)
        self.deferred = outcome.deferred
        pending = outcome.pending

        # hybrid-model state slots are a second admission resource: overflow
        # waits (page budget for it re-evaluates next step)
        free_slots_fn = getattr(self.executor, "free_slots", None)
        if free_slots_fn is not None:
            n = free_slots_fn()
            if len(pending) > n:
                self.deferred = pending[n:] + self.deferred
                pending = pending[:n]

        plan_kind = build_next_plan(bool(self.active), pending)
        if plan_kind is None:
            return False

        now = time.time()
        for req in pending:
            req.channel.send(
                Scheduled(
                    queued_at_unix_s=req.queued_at_unix_s,
                    scheduled_at_unix_s=now,
                    prompt_tokens=req.prompt_len,
                )
            )

        failure_targets = self._failure_targets(pending, plan_kind)
        try:
            self._execute_and_apply(plan_kind, pending)
        except Exception as e:  # noqa: BLE001 — keep serving on any step failure
            log.warning("execution step failed: %s", e, exc_info=True)
            self._fail_touched(failure_targets, str(e))
        return True

    # ── execution ────────────────────────────────────────────────────

    def _prefill_items(self, pending: List[PendingRequest]) -> List[PrefillStepItem]:
        return [
            PrefillStepItem(
                request_id=r.request_id,
                prompt_tokens=r.prompt_tokens,
                params=r.params,
                logprobs=r.logprobs,
                echo=r.echo,
                random_val=self.rng.random(),
            )
            for r in pending
        ]

    def _decode_items(self) -> List[DecodeStepItem]:
        return [
            DecodeStepItem(
                request_id=r.request_id,
                token_id=r.last_token,
                params=r.params,
                logprobs=r.logprobs,
                random_val=self.rng.random(),
            )
            for r in self.active
        ]

    def _execute_and_apply(self, plan_kind: str, pending: List[PendingRequest]) -> None:
        if plan_kind == "prefill":
            result = self.executor.execute_prefill(
                PrefillPlan(
                    requests=self._prefill_items(pending),
                    echo=any(r.echo for r in pending),
                )
            )
            self._apply_prefill(pending, result.requests)
        elif plan_kind == "decode":
            items = self._decode_items()
            if (
                hasattr(self.executor, "execute_decode_async")
                and self.executor.supports_async_decode(items)
            ):
                self._decode_pipelined(items)
            else:
                result = self.executor.execute_decode(DecodePlan(requests=items))
                self._apply_decode(result.requests)
        else:  # unified
            self._unified_interleaved(pending)

    def _decode_block_once(self) -> None:
        """One decode block for the active set (used between prefill
        chunks; no speculation — the batch may change right after)."""
        if not self.active:
            return
        items = self._decode_items()
        if not (
            hasattr(self.executor, "execute_decode_async")
            and self.executor.supports_async_decode(items)
        ):
            result = self.executor.execute_decode(DecodePlan(requests=items))
            self._apply_decode(result.requests)
            return
        n = self._decode_block_size()
        pend = self.executor.execute_decode_async(
            items, n_tokens=n, rand_matrix=self._rand_matrix(items, n)
        )
        self._apply_decode_tokens(self.executor.resolve_pending_multi(pend))

    def _unified_interleaved(self, pending: List[PendingRequest]) -> None:
        """Mixed step: prefills run chunk-by-chunk with decode blocks
        interleaved, so active streams' TPOT stalls are bounded by one chunk
        (the reference's unified_forward property, unified_forward.rs:1-78,
        realized by time-slicing instead of GEMM fusion)."""
        ex = self.executor
        chunkable = hasattr(ex, "prefill_stepper") and hasattr(
            ex, "supports_chunked_prefill"
        )
        done_results = []
        done_reqs = []
        plain = []
        plain_reqs = []
        for req in pending:
            item = self._prefill_items([req])[0]
            if chunkable and ex.supports_chunked_prefill(item) and self.active:
                gen = ex.prefill_stepper(item)
                # fused-piece resolve pipeline: piece k's decode tokens are
                # resolved AFTER piece k+1 is dispatched, so the host read
                # RTT overlaps the next piece's device time (the pure-
                # decode pipeline's speculative-dispatch trick applied to
                # the mixed step; tokens thread on device in the executor)
                prev_mp = [None]

                def flush_prev():
                    mp, prev_mp[0] = prev_mp[0], None
                    if mp is not None:
                        self._apply_decode_tokens(ex.resolve_pending_multi(mp))

                try:
                    while True:
                        # adaptive chunking: the stepper sizes its next
                        # chunk down while streams are actively decoding
                        # (executor.prefill_chunk_mixed, contract.py)
                        ex.decode_active = bool(self.active)
                        # fused mixed step (one dispatch: chunk rows ‖ one
                        # decode row per stream — reference
                        # unified_forward.rs): hand the stepper the decode
                        # batch; it leaves sampled tokens in mixed_pending
                        if hasattr(ex, "supports_mixed_step"):
                            ex.mixed_items = None  # never leave stale items
                            if self.active:
                                ditems = self._decode_items()
                                if ditems and ex.supports_mixed_step(ditems):
                                    if prev_mp[0] is not None and (
                                        tuple(i.request_id for i in ditems)
                                        != tuple(i.request_id
                                                 for i in prev_mp[0].items)
                                        or self._min_remaining() <= 2
                                    ):
                                        # composition changed / near a
                                        # length boundary: resolve first
                                        # (no speculative token past the
                                        # admitted budget)
                                        flush_prev()
                                        ditems = (self._decode_items()
                                                  if self.active else [])
                                    if ditems and ex.supports_mixed_step(
                                            ditems):
                                        ex.mixed_items = ditems
                                        ex.mixed_rand = self._rand_matrix(
                                            ditems, 1)
                        try:
                            next(gen)
                        except StopIteration as s:
                            done_results.append(s.value)
                            done_reqs.append(req)
                            break
                        mp = getattr(ex, "mixed_pending", None)
                        ex.mixed_pending = None
                        if mp is not None:
                            flush_prev()  # k-1 resolves while k executes
                            prev_mp[0] = mp
                        else:
                            flush_prev()
                            self._decode_block_once()
                finally:
                    ex.decode_active = False
                    if getattr(ex, "mixed_items", None) is not None:
                        ex.mixed_items = None
                    # drain in order: the pipelined piece, then a final
                    # piece that ran fused right before StopIteration
                    mp = getattr(ex, "mixed_pending", None)
                    ex.mixed_pending = None
                    flush_prev()
                    if mp is not None:
                        self._apply_decode_tokens(ex.resolve_pending_multi(mp))
            elif chunkable and self.active:
                # Non-chunkable prefill (e.g. echo+logprobs needs all-
                # position logits in one pass): run it ALONE and give the
                # active set a decode block right after — the decode stall
                # is bounded by one request's prefill, never the whole
                # pending queue (the reference bounds this structurally via
                # its fused unified GEMM pass, unified_forward.rs:1-78).
                result = ex.execute_prefill(
                    PrefillPlan(requests=[item], echo=item.echo)
                )
                done_results.append(result.requests[0])
                done_reqs.append(req)
                self._decode_block_once()
            else:
                plain.append(item)
                plain_reqs.append(req)
        if plain:
            result = self.executor.execute_unified(
                UnifiedPlan(prefill_requests=plain,
                            decode_requests=self._decode_items())
            )
            self._apply_prefill(plain_reqs, result.prefill_requests)
            self._apply_decode(result.decode_requests)
        if done_reqs:
            self._apply_prefill(done_reqs, done_results)
        if not plain:
            self._decode_block_once()

    def _min_remaining(self) -> int:
        return min(st.max_tokens - st.generated_count for st in self.active)

    def _decode_block_size(self, after: int = 0, steady: bool = False) -> int:
        """Tokens per dispatch: full block in steady state, single-token
        near a LENGTH boundary (so page use never exceeds the admitted
        full-lifetime budget). ``steady`` (the pipelined pure-decode loop)
        uses the larger throughput block — each dispatch carries ~2.5 ms of
        fixed device-side cost on this backend, so pure decode amortizes it
        over more tokens while mixed load keeps fine granularity."""
        block = getattr(self.executor, "decode_block", 1)
        if steady:
            block = max(block, getattr(self.executor, "decode_block_max", 0))
        rem = self._min_remaining() - after
        if rem >= block:
            return block
        small = getattr(self.executor, "decode_block", 1)
        return small if rem >= small else 1

    def _rand_matrix(self, items, n_tokens: int):
        if all(it.params.is_greedy for it in items):
            return None
        return [
            [self.rng.random() for _ in items] for _ in range(n_tokens)
        ]

    def _decode_pipelined(self, items) -> None:
        """Steady-state decode: N-token fused blocks + speculative dispatch.

        The device→host token read is slow (high-latency link), so (a) each
        dispatch computes ``decode_block`` tokens on device, and (b) up to
        ``decode_pipeline_depth - 1`` speculative blocks are dispatched —
        each consuming the previous block's sampled tokens directly on
        device — BEFORE the oldest block is read back. Depth 2 (default)
        keeps one block in flight behind the resolve; depth 3+ also absorbs
        one host hiccup (GC / link jitter) without a delivery stall — used
        by the small-block delivery profile (docs/PERF.md round 5). The
        pipeline drains whenever anything non-steady happens (arrival,
        finish, receiver drop); rows of a speculative block whose request
        finished in an earlier block are discarded (their KV is released
        with the request).
        """
        ex = self.executor
        depth = max(1, getattr(ex, "decode_pipeline_depth", 2))
        N = self._decode_block_size(steady=True)
        q: deque = deque()  # [(PendingDecode, n_tokens)]
        q.append((ex.execute_decode_async(
            items, n_tokens=N, rand_matrix=self._rand_matrix(items, N)
        ), N))
        queued = N

        def drain_rest() -> None:
            # finished / non-steady: resolve what's in flight, discard rows
            # of finished requests (their KV is already released)
            while q:
                blk, _ = q.popleft()
                self._apply_decode_tokens(ex.resolve_pending_multi(blk))

        while True:
            reqs, still_open = self.handle._drain()
            for r in reqs:
                self._ingest(r)
            closed = any(st.channel.is_closed for st in self.active)
            steady = still_open and not self.deferred and not closed
            if steady:
                # fill the speculative window; never speculate past a
                # LENGTH boundary (EOS finishes are handled by discarding)
                while (len(q) < depth
                       and self._min_remaining() > queued):
                    n2 = self._decode_block_size(after=queued, steady=True)
                    next_items = self._decode_items()  # token ids unused
                    q.append((ex.execute_decode_async(
                        next_items,
                        tokens_dev=q[-1][0].tokens_dev,
                        n_tokens=n2,
                        rand_matrix=self._rand_matrix(next_items, n2),
                    ), n2))
                    queued += n2
            blk, n = q.popleft()
            queued -= n
            finished = self._apply_decode_tokens(
                ex.resolve_pending_multi(blk))
            if not q:
                return
            if finished or not self.active or not steady:
                drain_rest()
                return

    def _apply_decode_tokens(self, results) -> set:
        """Apply an N-token block per request with single-token semantics
        (EOS mid-block discards the request's remaining tokens)."""
        by_id = {st.request_id: st for st in self.active}
        finished_ids = set()
        for rid, toks, lps in results:
            # A speculative piece may carry rows for requests that EOS-
            # finished when the prior piece was applied (mixed-step
            # flush_prev / finally-drain); their KV is already released —
            # discard those rows (mirrors _decode_pipelined's res2 filter).
            st = by_id.get(rid)
            if st is None:
                continue
            for ti, tok in enumerate(toks):
                completion = st.generated_count + 1
                is_eos = not st.params.ignore_eos and self.executor.is_stop_token(tok)
                if is_eos:
                    st.channel.send(Finished(FinishReason.STOP, st.prompt_len, completion))
                    finished_ids.add(rid)
                    break
                st.channel.send(Token(tok, lps[ti] if lps else None))
                st.last_token = tok
                st.generated_count = completion
                if completion >= st.max_tokens:
                    st.channel.send(
                        Finished(FinishReason.LENGTH, st.prompt_len, completion)
                    )
                    finished_ids.add(rid)
                    break
        for rid in finished_ids:
            self.executor.release_request(rid)
        if finished_ids:
            self.active = [s for s in self.active if s.request_id not in finished_ids]
        return finished_ids

    # ── resolve + effects (reference scheduler/{resolve,effects}.rs) ──

    def _apply_prefill(self, pending, results) -> None:
        for req, res in zip(pending, results):
            assert req.request_id == res.request_id
            if req.echo:
                lp = res.prompt_logprobs or [None] * req.prompt_len
                req.channel.send(PromptTokens(ids=list(req.prompt_tokens), logprobs=lp))

            if not req.params.ignore_eos and self.executor.is_stop_token(res.first_token):
                req.channel.send(
                    Finished(FinishReason.STOP, req.prompt_len, 0)
                )
                self.executor.release_request(req.request_id)
                continue
            if req.max_tokens <= 1:
                req.channel.send(Token(res.first_token, res.first_token_logprob))
                req.channel.send(Finished(FinishReason.LENGTH, req.prompt_len, 1))
                self.executor.release_request(req.request_id)
                continue
            req.channel.send(Token(res.first_token, res.first_token_logprob))
            self.active.append(
                ActiveRequestState(
                    request_id=req.request_id,
                    channel=req.channel,
                    last_token=res.first_token,
                    generated_count=1,
                    max_tokens=req.max_tokens,
                    prompt_len=req.prompt_len,
                    params=req.params,
                    logprobs=req.logprobs,
                )
            )

    def _apply_decode(self, results) -> set:
        by_id = {st.request_id: st for st in self.active}
        finished_ids = set()
        for res in results:
            st = by_id[res.request_id]
            completion = st.generated_count + 1
            is_eos = not st.params.ignore_eos and self.executor.is_stop_token(res.token)
            at_limit = completion >= st.max_tokens
            if is_eos:
                st.channel.send(Finished(FinishReason.STOP, st.prompt_len, completion))
                finished_ids.add(st.request_id)
            elif at_limit:
                st.channel.send(Token(res.token, res.logprob))
                st.channel.send(Finished(FinishReason.LENGTH, st.prompt_len, completion))
                finished_ids.add(st.request_id)
            else:
                st.channel.send(Token(res.token, res.logprob))
                st.last_token = res.token
                st.generated_count = completion
        if finished_ids:
            for rid in finished_ids:
                self.executor.release_request(rid)
            self.active = [s for s in self.active if s.request_id not in finished_ids]
        return finished_ids

    # ── failure handling ─────────────────────────────────────────────

    def _failure_targets(self, pending, plan_kind) -> List[_FailureTarget]:
        targets = [
            _FailureTarget(r.request_id, r.channel, r.prompt_len, 0) for r in pending
        ]
        if plan_kind in ("decode", "unified"):
            targets.extend(
                _FailureTarget(s.request_id, s.channel, s.prompt_len, s.generated_count)
                for s in self.active
            )
        return targets

    def _fail_touched(self, targets: List[_FailureTarget], message: str) -> None:
        for t in targets:
            t.channel.send(Error(message, t.prompt_tokens, t.completion_tokens))
            self.executor.release_request(t.request_id)
        failed = {t.request_id for t in targets}
        self.active = [s for s in self.active if s.request_id not in failed]

    def _send_rejection(self, req: PendingRequest) -> None:
        max_tok = kvmod.max_request_tokens(req.prompt_len, req.max_tokens)
        req.channel.send(
            Rejected(
                message=(
                    "request requires more KV pages than this model instance can "
                    f"provide: prompt_tokens={req.prompt_len}, max_context_tokens={max_tok}"
                ),
                prompt_tokens=req.prompt_len,
                completion_tokens=0,
            )
        )


def start_scheduler(executor: ModelExecutor, seed: int = 42) -> EngineHandle:
    """Spawn the scheduler thread and return the submit handle
    (reference start pattern: qwen3-4b/src/scheduler.rs:85-93)."""
    handle = EngineHandle()
    sched = Scheduler(executor, handle, seed=seed)
    t = threading.Thread(target=sched.run, name="pegainfer-scheduler", daemon=True)
    t.start()
    handle._scheduler = sched  # type: ignore[attr-defined]  # test/introspection hook
    handle._thread = t  # type: ignore[attr-defined]
    return handle
