"""Host-side paged-KV accounting: page pool, per-request KV state, admission.

Pure host logic, semantics ported from the reference's page pool / KV pool /
admission rule (pegainfer-core/src/page_pool.rs:7-122,
pegainfer-core/src/kv_pool.rs:78-278,
pegainfer-qwen3-4b/src/scheduler.rs:185-254). The device side (the actual KV
block array and the attention kernels that read it) lives in
``pegainfer_tpu.ops.attention`` and the executors.

Key invariant (the kv-pressure-hang fix, docs/models/qwen3/kv-pressure-hang.md):
a request is only admitted when its *full-lifetime* page count fits in the
budget after subtracting every active request's future growth — so decode can
never deadlock on page exhaustion.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence


def pages_needed(token_count: int, page_size: int) -> int:
    return -(-token_count // page_size)  # ceil div


class PagePool:
    """Refcounted free-list allocator over a fixed set of KV page ids.

    Page id 0 is reserved as the *null page*: padded batch rows in the jitted
    decode step write their (masked-out) K/V there, so it must never be handed
    to a request.

    Pages are refcounted so the prefix cache can share immutable prompt
    pages across requests (``incref``/``free`` = decref; a page returns to
    the free list when its count reaches 0). ``alloc`` hands out pages at
    refcount 1. An optional eviction hook is invoked on shortage (the
    prefix cache releases LRU entries) before alloc gives up.
    """

    NULL_PAGE = 0

    def __init__(self, num_pages: int, reserve_null_page: bool = True) -> None:
        if num_pages < 2:
            raise ValueError("need at least 2 pages (one is the null page)")
        self.num_pages = num_pages
        first = 1 if reserve_null_page else 0
        self._free: List[int] = list(range(num_pages - 1, first - 1, -1))
        self._refs: Dict[int, int] = {}
        self._allocated = 0
        self._evict_hook = None  # callable(n_pages_needed) -> None

    @property
    def available(self) -> int:
        return len(self._free)

    @property
    def allocated(self) -> int:
        return self._allocated

    def set_eviction_hook(self, hook) -> None:
        self._evict_hook = hook

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free) and self._evict_hook is not None:
            self._evict_hook(n - len(self._free))
        if n > len(self._free):
            raise RuntimeError(f"page pool exhausted: want {n}, have {len(self._free)}")
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._refs[p] = 1
        self._allocated += n
        return pages

    def incref(self, pages: Sequence[int]) -> None:
        for p in pages:
            self._refs[p] += 1

    def free(self, pages: Sequence[int]) -> None:
        """Drop one reference per page; reclaim pages that hit zero."""
        for p in pages:
            if p == self.NULL_PAGE:
                raise ValueError("freeing the null page")
            left = self._refs[p] - 1
            if left == 0:
                del self._refs[p]
                self._free.append(p)
                self._allocated -= 1
            else:
                self._refs[p] = left


@dataclass
class KvState:
    """Per-request KV occupancy: ordered page list + token length.

    Mirrors the reference KvState grow/advance/reset lifecycle
    (pegainfer-core/src/kv_pool.rs:151-278). ``prefix_len`` > 0 means the
    first pages were seeded from the prefix cache (already written on
    device, shared read-only) and prefill starts at that offset.
    """

    page_size: int
    pages: List[int] = field(default_factory=list)
    length: int = 0  # tokens currently stored
    prefix_len: int = 0  # cached-prefix tokens (page-aligned)
    prefix_checked: bool = False  # cache lookup already performed
    prefix_snap: Optional[object] = None  # hybrid-model state snapshot to restore

    @property
    def capacity(self) -> int:
        return len(self.pages) * self.page_size

    def ensure_capacity(self, pool: PagePool, total_tokens: int) -> None:
        """Grow the page list so ``total_tokens`` fit."""
        need = pages_needed(total_tokens, self.page_size) - len(self.pages)
        if need > 0:
            self.pages.extend(pool.alloc(need))

    def advance(self, n: int = 1) -> None:
        self.length += n
        if self.length > self.capacity:
            raise RuntimeError(
                f"KV advance past capacity: len={self.length} cap={self.capacity}"
            )

    def release(self, pool: PagePool) -> None:
        if self.pages:
            pool.free(self.pages)
        self.pages = []
        self.length = 0


class KvAccounting:
    """Tracks KvState per request id over a shared PagePool."""

    def __init__(self, pool: PagePool, page_size: int) -> None:
        self.pool = pool
        self.page_size = page_size
        self._states: Dict[int, KvState] = {}

    def state(self, request_id: int) -> KvState:
        st = self._states.get(request_id)
        if st is None:
            st = KvState(page_size=self.page_size)
            self._states[request_id] = st
        return st

    def get(self, request_id: int) -> Optional[KvState]:
        return self._states.get(request_id)

    def release(self, request_id: int) -> None:
        st = self._states.pop(request_id, None)
        if st is not None:
            st.release(self.pool)

    def release_all(self) -> None:
        for rid in list(self._states):
            self.release(rid)


# ── Prefix cache ─────────────────────────────────────────────────────────

# Hybrid-state snapshot cap (LRU). Shared constant: engines that reserve
# HBM for snapshots (qwen35_engine._compute_num_pages) must use the same
# number or the KV-pool sizing silently diverges from the cache's actual
# HBM use. Each prompt family holds up to TWO entries (deepest interior
# boundary + aligned end), so the cap must be ≥ 2x the concurrently-warm
# prompt families or reuse thrashes.
DEFAULT_MAX_SNAPSHOTS = 8


class PrefixCache:
    """Shared-prompt-prefix page cache over the refcounted PagePool.

    Design: docs/prefix-cache-design.md (the reference carries the same
    design as a doc only, prefix-paged-kv-pd-handoff.md). The paged layout
    makes prefixes shareable for free: a cached prefix is a chain of
    immutable page ids addressed through per-request page tables — reuse is
    a host-side table edit, zero device copies.

    Keys are a rolling hash per page boundary (hash chains the previous
    key with the page's token ids), so key_i identifies tokens[0:(i+1)*ps]
    exactly. LRU eviction runs via the pool's shortage hook.
    """

    def __init__(self, pool: PagePool, page_size: int,
                 max_snapshots: int = DEFAULT_MAX_SNAPSHOTS) -> None:
        self.pool = pool
        self.page_size = page_size
        self._pages: Dict[int, int] = {}  # chain key -> page id
        self._lru: Dict[int, int] = {}  # chain key -> tick (dict = insertion order)
        self._tick = 0
        self.hits = 0
        self.misses = 0
        # Hybrid-model state snapshots: chain key -> (pos, device pytree).
        # Linear-attention / compressor state is position-dependent, so a
        # prefix is only reusable at positions where the per-slot state was
        # snapshotted (docs/prefix-cache-design.md "Hybrid/DSv4 caveat").
        # Snapshots are tens of MB of HBM each — LRU-capped by count. Each
        # prompt family holds up to TWO entries (deepest interior boundary
        # + aligned end), so the cap must be ≥ 2x the concurrently-warm
        # prompt families or reuse thrashes (measured: cap 4 with 3
        # families sent the base prompt back to cold TTFT).
        self._snaps: Dict[int, tuple] = {}
        self.max_snapshots = max_snapshots
        pool.set_eviction_hook(self._evict)

    def _keys(self, tokens: Sequence[int]):
        ps = self.page_size
        h = 0
        for i in range(len(tokens) // ps):
            h = hash((h, tuple(tokens[i * ps:(i + 1) * ps])))
            yield h

    def match(self, tokens: Sequence[int]) -> tuple:
        """Longest cached prefix of ``tokens``, capped to len-1 tokens (the
        last prompt token always re-runs so prefill emits its logits).
        Returns (n_tokens, page_ids) with one pool reference taken per page
        on the caller's behalf."""
        ps = self.page_size
        usable = (len(tokens) - 1) // ps  # full pages, excluding last token
        pages: List[int] = []
        self._tick += 1
        for i, key in enumerate(self._keys(tokens)):
            if i >= usable:
                break
            pid = self._pages.get(key)
            if pid is None:
                break
            pages.append(pid)
            self._lru[key] = self._tick
        if pages:
            self.pool.incref(pages)
            self.hits += 1
        else:
            self.misses += 1
        return len(pages) * ps, pages

    def match_hybrid(self, tokens: Sequence[int]) -> tuple:
        """Longest cached prefix USABLE BY A STATEFUL MODEL: the largest
        snapshotted position whose page chain is fully cached. Returns
        (n_tokens, page_ids, snapshot) — pages increfed as in ``match``;
        (0, [], None) when no snapshotted boundary matches."""
        ps = self.page_size
        usable = (len(tokens) - 1) // ps  # full pages, excluding last token
        self._tick += 1
        chain: List[tuple] = []  # (key, page_id) per matched page
        best = None  # (n_pages, key)
        for i, key in enumerate(self._keys(tokens)):
            if i >= usable:
                break
            pid = self._pages.get(key)
            if pid is None:
                break
            chain.append((key, pid))
            if key in self._snaps:
                best = (i + 1, key)
        if best is None:
            self.misses += 1
            return 0, [], None
        n_pages, skey = best
        pages = [pid for _, pid in chain[:n_pages]]
        for key, _ in chain[:n_pages]:
            self._lru[key] = self._tick
        pos, snap = self._snaps.pop(skey)
        self._snaps[skey] = (pos, snap)  # refresh snapshot LRU order
        assert pos == n_pages * ps
        self.pool.incref(pages)
        self.hits += 1
        return pos, pages, snap

    def insert_snapshot(self, tokens: Sequence[int], pos: int, snap) -> None:
        """Register a state snapshot taken after exactly ``pos`` tokens
        (page-aligned). The page chain for those tokens must be inserted
        separately (``insert``); a snapshot whose pages were evicted simply
        never matches and ages out."""
        ps = self.page_size
        if pos <= 0 or pos % ps or pos > len(tokens):
            return
        keys = list(self._keys(tokens[:pos]))
        key = keys[pos // ps - 1]
        self._snaps.pop(key, None)
        self._snaps[key] = (pos, snap)
        while len(self._snaps) > self.max_snapshots:
            self._snaps.pop(next(iter(self._snaps)))

    def insert(self, tokens: Sequence[int], pages: Sequence[int]) -> None:
        """Register a prefilled prompt's full pages (immutable: generated
        tokens land on later pages). Takes one reference per newly cached
        page; already-cached chains are left as-is."""
        self._tick += 1
        for i, key in enumerate(self._keys(tokens)):
            if i >= len(pages):
                break
            if key in self._pages:
                self._lru[key] = self._tick
                continue
            self._pages[key] = pages[i]
            self._lru[key] = self._tick
            self.pool.incref([pages[i]])

    def evictable(self) -> int:
        """Pages only the cache holds (refcount 1) — reclaimable on demand.
        Admission must count these as available or a cache-filled pool
        deadlocks deferred requests (the eviction hook only fires on
        alloc, which admission never reaches)."""
        refs = self.pool._refs
        return sum(1 for pid in self._pages.values() if refs.get(pid) == 1)

    def _evict(self, n_pages: int) -> None:
        """Drop LRU entries until ``n_pages`` pages actually return to the
        free list (a dropped ref only frees a page no live request shares)
        or the cache is empty. Entries orphaned by an evicted ancestor age
        out the same way (match always walks from page 0)."""
        want = self.pool.available + max(n_pages, 0)
        for key, _ in sorted(self._lru.items(), key=lambda kv: kv[1]):
            if self.pool.available >= want:
                break
            pid = self._pages.pop(key)
            del self._lru[key]
            self.pool.free([pid])

    def clear(self) -> None:
        self._snaps.clear()
        self._evict(len(self._pages))


class SlotPrefixCache:
    """Prefix cache for PAGE-LESS models (DSv4: fixed per-slot window ring
    + compressed rows, no paged KV — dsv4_engine degenerates page_size=1).

    A cached entry is the FULL prompt's token tuple plus the slot-state
    snapshot taken after prefilling exactly those tokens (dsv4.slot_export
    — the same payload PD handoff ships), optionally with the prompt-end
    logits. A later prompt extending a cached one imports the snapshot and
    runs only the suffix through the scanned decode recurrence
    (dsv4.prefill_resume_grouped); an IDENTICAL prompt with stored logits
    skips the forward entirely. Reference analog: design-doc-only
    (docs/models/deepseek-v4/prefix-paged-kv-pd-handoff.md).

    Snapshots are whole-slot state rows (MBs of HBM each at real scale),
    so the cache is LRU-capped by entry count, not bytes.
    """

    def __init__(self, max_entries: int = 4) -> None:
        # key: prompt token tuple -> (snap pytree, logits [V] f32 | None);
        # dict insertion order = LRU order (refreshed on hit)
        self._entries: Dict[tuple, tuple] = {}
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0

    def match(self, tokens: Sequence[int]) -> Optional[tuple]:
        """Longest cached prompt that is a prefix of ``tokens``. Returns
        (pos, snap, logits) — ``pos == len(tokens)`` only when the entry
        stored logits (there is no forward left to produce them). None on
        miss."""
        t = tuple(tokens)
        best = None
        for key, (snap, logits) in self._entries.items():
            n = len(key)
            if n > len(t) or (n == len(t) and logits is None):
                continue
            if best is not None and n <= best[0]:
                continue
            if t[:n] == key:
                best = (n, key, snap, logits)
        if best is None:
            self.misses += 1
            return None
        n, key, snap, logits = best
        entry = self._entries.pop(key)
        self._entries[key] = entry  # refresh LRU order
        self.hits += 1
        return n, snap, logits

    def insert(self, tokens: Sequence[int], snap, logits=None) -> None:
        key = tuple(tokens)
        if not key:
            return
        old = self._entries.pop(key, None)
        if old is not None and logits is None:
            logits = old[1]  # keep better information on re-insert
        self._entries[key] = (snap, logits)
        while len(self._entries) > self.max_entries:
            self._entries.pop(next(iter(self._entries)))

    def clear(self) -> None:
        self._entries.clear()


# ── Native backend ───────────────────────────────────────────────────────


class _NativeKvState:
    """KvState-compatible proxy over the C++ HostKv."""

    __slots__ = ("_kv", "_rid")

    def __init__(self, kv, rid: int):
        self._kv = kv
        self._rid = rid

    @property
    def length(self) -> int:
        return self._kv.length(self._rid)

    @property
    def pages(self):
        return self._kv.pages(self._rid)

    def ensure_capacity(self, _pool, total_tokens: int) -> None:
        self._kv.ensure(self._rid, total_tokens)

    def advance(self, n: int = 1) -> None:
        self._kv.advance(self._rid, n)


class _NativePoolView:
    __slots__ = ("_pool",)

    def __init__(self, pool):
        self._pool = pool

    @property
    def available(self) -> int:
        return self._pool.available

    @property
    def allocated(self) -> int:
        return self._pool.allocated


class NativeKvAccounting:
    """KvAccounting backed by the C++ host runtime core (native/).

    Same surface as KvAccounting; `assemble` additionally builds a whole
    decode batch (tokens/positions/tables/seq_lens/slots) in one C call.
    """

    def __init__(self, host_module, num_pages: int, page_size: int):
        self._host = host_module
        self._pool = host_module.HostPool(num_pages)
        self._kv = host_module.HostKv(self._pool, page_size)
        self.pool = _NativePoolView(self._pool)
        self.page_size = page_size

    def state(self, request_id: int) -> _NativeKvState:
        return _NativeKvState(self._kv, request_id)

    def get(self, request_id: int):
        return self.state(request_id)

    def release(self, request_id: int) -> None:
        self._kv.release(request_id)

    def assemble(self, request_ids, token_ids, B: int, P: int,
                 extra_tokens: int, dead_slot: int, slot_ids):
        import numpy as np

        buf = self._kv.assemble(
            list(request_ids), list(token_ids), B, P, extra_tokens,
            dead_slot, list(slot_ids),
        )
        arr = np.frombuffer(buf, np.int32)
        tokens = arr[:B]
        positions = arr[B:2 * B]
        tables = arr[2 * B:2 * B + B * P].reshape(B, P)
        seq_lens = arr[2 * B + B * P:3 * B + B * P]
        slots = arr[3 * B + B * P:]
        return tokens, positions, tables, seq_lens, slots


def make_accounting(num_pages: int, page_size: int):
    """Native accounting when the C++ core is available, Python otherwise."""
    try:
        from pegainfer_tpu.native import get_module

        host = get_module()
    except Exception:  # noqa: BLE001
        host = None
    if host is not None:
        return NativeKvAccounting(host, num_pages, page_size)
    return KvAccounting(PagePool(num_pages), page_size)


# ── Admission control ────────────────────────────────────────────────────
# Reference: pegainfer-qwen3-4b/src/scheduler.rs:185-254. Prefill samples the
# first output token but does not append it to KV; a generated token occupies
# KV only when fed back as a decode input — so N completion tokens occupy at
# most N-1 KV slots.


def max_request_tokens(prompt_len: int, max_tokens: int) -> int:
    return prompt_len + max(max_tokens - 1, 0)


@dataclass
class AdmissionOutcome:
    pending: list
    deferred: list
    rejected: list


def admit_deferred_requests(
    deferred: list,
    active: list,
    page_size: int,
    available_pages: int,
    max_request_pages: int,
) -> AdmissionOutcome:
    """FCFS admission under the full-lifetime page budget.

    ``deferred`` items need ``.prompt_len`` and ``.max_tokens``; ``active``
    items need ``.prompt_len``, ``.max_tokens`` and ``.generated_count``.
    """
    future = 0
    for req in active:
        max_tok = max_request_tokens(req.prompt_len, req.max_tokens)
        cur_tok = req.prompt_len + max(req.generated_count - 1, 0)
        future += pages_needed(max_tok, page_size) - pages_needed(cur_tok, page_size)

    budget = max(available_pages - future, 0)
    pending, still_deferred, rejected = [], [], []
    for req in deferred:
        max_needed = pages_needed(
            max_request_tokens(req.prompt_len, req.max_tokens), page_size
        )
        if max_needed > max_request_pages:
            rejected.append(req)
        elif max_needed <= budget:
            budget -= max_needed
            pending.append(req)
        else:
            still_deferred.append(req)
    return AdmissionOutcome(pending, still_deferred, rejected)
