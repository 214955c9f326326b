"""Engine contract: the stable seam between frontend, scheduler, and models.

TPU-native equivalent of the reference engine contract
(pegainfer-engine/src/engine.rs:8-105, src/sampler.rs:1-18): an
``EngineHandle`` accepts ``GenerateRequest``s and streams ``TokenEvent``s
back over a per-request channel. The scheduler runs on a dedicated host
thread; consumers may be sync or asyncio (the HTTP frontend).
"""

from __future__ import annotations

import asyncio
import enum
import queue
import threading
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple


class FinishReason(str, enum.Enum):
    LENGTH = "length"
    STOP = "stop"
    ERROR = "error"


@dataclass(frozen=True)
class SamplingParams:
    """temperature == 0.0 means greedy; top_k <= 0 means no top-k filter;
    top_p >= 1.0 means no nucleus filter. Matches reference defaults
    (pegainfer-engine/src/sampler.rs:10-17)."""

    temperature: float = 0.0
    top_k: int = -1
    top_p: float = 1.0
    ignore_eos: bool = False

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0


@dataclass
class EngineLoadOptions:
    """Engine startup options (reference: engine.rs:8-24).

    ``enable_cuda_graph`` is kept for CLI compatibility; on TPU the analogous
    machinery is the bucketed pre-compiled jit decode step, controlled by
    ``precompile``.
    """

    precompile: bool = True
    enable_cuda_graph: bool = True  # accepted, alias for precompile
    device_ordinals: List[int] = field(default_factory=lambda: [0])
    seed: int = 42
    # Fraction of free HBM given to the paged KV pool (reference sizes its
    # pool to 85% of free VRAM, pegainfer-qwen3-4b/src/weights.rs:316-334).
    kv_memory_fraction: float = 0.85
    max_num_pages: Optional[int] = None  # override pool size (tests)
    max_batch_size: int = 64
    max_model_len: Optional[int] = None
    # Tokens computed per decode dispatch in the steady-state pipeline: the
    # host link's read latency is amortized over this many tokens. Token
    # events are emitted in bursts of this size.
    decode_block: int = 4
    # Block size for PURE steady-state decode (no prefills pending): each
    # dispatch carries a fixed ~2.5 ms device-side cost on this backend
    # (measured: N=4→16 took the bf16 headline 11.77→11.30 ms/tok), so
    # throughput-bound decode amortizes it over more tokens. Mixed load and
    # near-boundary steps keep ``decode_block`` granularity (a new request
    # waits at most one block). Set equal to decode_block to disable.
    decode_block_max: int = 16
    # Speculative-dispatch window of the steady pipeline: this many blocks
    # in flight before the oldest is read back. 2 = one block behind the
    # resolve (the read RTT hides under the next block's device time);
    # 3 also absorbs one host hiccup (GC / link jitter) — pair with small
    # blocks for delivery-bounded serving. Measured frontier (qwen3 bf16
    # 1024/256, docs/PERF.md round 5): block_max 16 → 11.31 ms TPOT but
    # 188 ms p95 delivery gap; block_max 4 + depth 3 → ≈11.8 ms (+4.6%)
    # at ≈49 ms p95 gap (the reference streams per-token at 11.31).
    decode_pipeline_depth: int = 2
    # Prompts longer than this prefill in fixed-size chunks (bounded compile
    # sizes + tighter padding); models without a chunk path ignore it.
    prefill_chunk: int = 2048
    # Chunk size while OTHER requests are actively decoding (adaptive
    # chunking). With the FUSED mixed step (decode rows ride each chunk
    # dispatch, resolves pipelined one piece deep — jax_executor
    # _run_mixed_piece) the decode token cadence IS the chunk cadence, so
    # smaller mixed chunks directly bound the stall. Round-4 A/B
    # (scripts/mixed_load_bench.py, 10k-prefill storm): time-sliced 512 =
    # 26.6 ms effective / p95 gap 140; FUSED 256 = 28.5 ms effective /
    # p95 gap 58.8. Set equal to prefill_chunk to disable adaptivity;
    # PEGAINFER_MIXED_FUSED=0 restores the time-sliced interleave.
    prefill_chunk_mixed: int = 256
    # Weight quantization mode: None (checkpoint dtype — for DSv4 this
    # means FP8/FP4 quantized-resident in HBM), "int8" (weight-only
    # per-output-channel int8 for the Qwen families — approximate serving,
    # halves decode HBM traffic), or "bf16" (dequantize a quantized
    # checkpoint at load — the DSv4 numerics oracle). Models without
    # support ignore it.
    quantize: Optional[str] = None
    # Shared-prompt-prefix page cache (docs/prefix-cache-design.md): repeat
    # prompts skip prefilling their cached page-aligned prefix. Active for
    # models that declare support (stateless-prefix attention, e.g. Qwen3);
    # forces the Python KV accounting backend.
    enable_prefix_cache: bool = True


@dataclass
class TokenLogprob:
    logprob: float
    top_logprobs: List[Tuple[int, float]] = field(default_factory=list)


class TokenEvent:
    """Union of events streamed back per request (reference engine.rs:59-86)."""

    __slots__ = ()


@dataclass
class Scheduled(TokenEvent):
    queued_at_unix_s: float
    scheduled_at_unix_s: float
    prompt_tokens: int


@dataclass
class Token(TokenEvent):
    id: int
    logprob: Optional[TokenLogprob] = None


@dataclass
class PromptTokens(TokenEvent):
    ids: List[int]
    logprobs: List[Optional[TokenLogprob]] = field(default_factory=list)


@dataclass
class Finished(TokenEvent):
    finish_reason: FinishReason
    prompt_tokens: int
    completion_tokens: int


@dataclass
class Error(TokenEvent):
    message: str
    prompt_tokens: int
    completion_tokens: int


@dataclass
class Rejected(TokenEvent):
    message: str
    prompt_tokens: int
    completion_tokens: int


_TERMINAL = (Finished, Error, Rejected)


def is_terminal(event: TokenEvent) -> bool:
    return isinstance(event, _TERMINAL)


class TokenChannel:
    """Unbounded SPSC channel from the scheduler thread to a consumer.

    The consumer may ``close()`` (receiver drop); the scheduler observes
    ``is_closed`` and retires the request, mirroring the reference's
    receiver-drop cleanup (qwen3-4b/tests/e2e.rs:193-214).
    """

    def __init__(self) -> None:
        self._q: "queue.SimpleQueue[Optional[TokenEvent]]" = queue.SimpleQueue()
        self._closed = threading.Event()
        self._done = threading.Event()

    # -- sender side (scheduler thread) --
    def send(self, event: TokenEvent) -> bool:
        if self._closed.is_set():
            return False
        self._q.put(event)
        if is_terminal(event):
            self._done.set()
            self._q.put(None)
        return True

    @property
    def is_closed(self) -> bool:
        return self._closed.is_set()

    # -- receiver side --
    def close(self) -> None:
        self._closed.set()
        self._q.put(None)

    def __iter__(self) -> Iterator[TokenEvent]:
        while True:
            ev = self._q.get()
            if ev is None:
                return
            yield ev

    def get(self, timeout: Optional[float] = None) -> Optional[TokenEvent]:
        try:
            return self._q.get(timeout=timeout)
        except queue.Empty:
            return None

    async def __aiter__(self):
        loop = asyncio.get_running_loop()
        while True:
            ev = await loop.run_in_executor(None, self._q.get)
            if ev is None:
                return
            yield ev


@dataclass
class GenerateRequest:
    """One generation request (reference engine.rs:46-57)."""

    prompt_tokens: List[int]
    max_tokens: int
    params: SamplingParams = field(default_factory=SamplingParams)
    channel: TokenChannel = field(default_factory=TokenChannel)
    request_id: Optional[str] = None
    queued_at_unix_s: Optional[float] = None
    logprobs: int = 0
    echo: bool = False


class EngineHandle:
    """Cloneable submit handle; the scheduler drains the shared queue."""

    def __init__(self) -> None:
        self._submit_q: "queue.SimpleQueue[Optional[GenerateRequest]]" = queue.SimpleQueue()
        self._shutdown = threading.Event()

    def submit(self, req: GenerateRequest) -> None:
        if self._shutdown.is_set():
            raise RuntimeError("engine is shut down")
        self._submit_q.put(req)

    def shutdown(self) -> None:
        self._shutdown.set()
        self._submit_q.put(None)

    # -- scheduler side --
    def _drain(self) -> Tuple[List[GenerateRequest], bool]:
        """Non-blocking drain. Returns (requests, still_open)."""
        out: List[GenerateRequest] = []
        while True:
            try:
                item = self._submit_q.get_nowait()
            except queue.Empty:
                return out, True
            if item is None:
                return out, False
            out.append(item)

    def _recv_blocking(self, timeout: Optional[float] = None) -> Tuple[Optional[GenerateRequest], bool]:
        """Blocking receive of one request. Returns (request|None, still_open)."""
        try:
            item = self._submit_q.get(timeout=timeout)
        except queue.Empty:
            return None, True
        if item is None:
            return None, False
        return item, True
