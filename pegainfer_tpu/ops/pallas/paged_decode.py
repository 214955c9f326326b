"""Paged GQA decode attention: ragged flash-decode over the page table.

The TPU answer to FlashInfer's paged_attention_decode_cuda / _split_kv
(csrc/paged_attention.cu; split-KV config batch_decode_buffers.rs:14-31):
per (request, kv-head) grid program, pages stream HBM→VMEM with
double-buffered async DMA driven by the scalar-prefetched page table, and
online softmax accumulates across page chunks — so only live tokens are
read, at any context length, with no [B, S] score materialization. The
chunked sweep *is* the split-KV path (chunks play the role of KV partitions,
merged by the running softmax instead of a second merge kernel).

KV layout (head-major): k_pages/v_pages [Hkv, num_pages, page_size, hd];
one (request, head) page DMA is a contiguous [page_size, hd] block.

Full-pool form (layer_id given): the pool is k/v-ADJACENT —
[L, Hkv, pages, 2, page_size, hd] — so ONE DMA fetches a page's k AND v
as a contiguous [2, page_size, hd] block. DMA issue count on the scalar
core is the long-context bottleneck (docs/ROADMAP.md #8): merging the
k/v fetches halves it vs the separated [L, 2, Hkv, ...] layout.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# pages per double-buffered DMA chunk (tuning knob; larger chunks amortize
# per-chunk control overhead at long context — measured on-chip at ps=64:
# 16k-ctx step 18.4 ms at cp=16 vs 18.1 at cp=32 vs 20.1 at cp=8
# (scripts/decode_context_sweep.py + scripts/paged_decode_probe.py).
# Default 16: within 1.6% of cp=32 at 16k while halving the masked-tail
# compute a too-wide last chunk pays at SHORT context (the last chunk
# always computes cp*ps positions; only `past` of them are live).
# VMEM cost = 2 x cp x 2*ps x hd x dtype.
DEFAULT_CHUNK_PAGES = int(os.environ.get("PEGAINFER_CHUNK_PAGES", "16"))


def _kernel(
    # scalar prefetch
    tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    layer_ref,  # [1] int32 (layer index into a full pool; 0 for 4-D layouts)
    # inputs: q, then ONE pool ref ([L, Hkv, pages, 2, ps, hd], pool layout)
    # or TWO per-layer refs (k/v [Hkv, pages, ps, hd]), then cur k/v
    # output: o_ref; scratch: k_buf, v_buf (pool: ONE kv_buf + dummy), sem
    *refs,
    cp: int,
    ps: int,
    has_cur: bool,
    pool_layout: bool,
    fold_heads: bool = False,
):
    if pool_layout:
        q_ref, kv_hbm, cur_k_ref, cur_v_ref, o_ref, kv_buf, sem = refs
    else:
        q_ref, k_hbm, v_hbm, cur_k_ref, cur_v_ref, o_ref, k_buf, v_buf, sem = refs
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    past = jnp.maximum(seq_len - 1, 0) if has_cur else seq_len
    num_pages = jnp.maximum(pl.cdiv(past, ps), 0)
    num_chunks = pl.cdiv(num_pages, cp)
    li = layer_ref[0]

    if fold_heads:
        # ONE program per request: loop kv heads statically inside (on a
        # single-tensor-core chip per-head grid programs buy no parallelism
        # and each costs ~14 us of fixed program overhead — x8 heads x36
        # layers ≈ 4 ms/step of pure overhead at short context, measured
        # via scripts/paged_decode_probe.py; docs/PERF.md round 3)
        for h in range(q_ref.shape[1]):
            _head(tables_ref, seq_len, past, num_pages, num_chunks, li, b, h,
                  refs, cp=cp, ps=ps, has_cur=has_cur,
                  pool_layout=pool_layout, fold_heads=True)
    else:
        _head(tables_ref, seq_len, past, num_pages, num_chunks, li, b,
              pl.program_id(1), refs, cp=cp, ps=ps, has_cur=has_cur,
              pool_layout=pool_layout, fold_heads=False)


def _head(tables_ref, seq_len, past, num_pages, num_chunks, li, b, h, refs, *,
          cp: int, ps: int, has_cur: bool, pool_layout: bool,
          fold_heads: bool):
    if pool_layout:
        q_ref, kv_hbm, cur_k_ref, cur_v_ref, o_ref, kv_buf, sem = refs
    else:
        q_ref, k_hbm, v_hbm, cur_k_ref, cur_v_ref, o_ref, k_buf, v_buf, sem = refs
    hq = h if fold_heads else 0  # block index of this head in q/cur/o

    def start_chunk(ci, slot):
        base = ci * cp
        for idx in range(cp):  # static unroll: cp small (4-8)
            @pl.when(base + idx < num_pages)
            def _():
                pid = tables_ref[b, base + idx]
                if pool_layout:
                    # k/v-adjacent pool: ONE DMA per page fetches the
                    # contiguous [2, ps, hd] k+v block (halves DMA issues —
                    # the scalar-core bottleneck at long context)
                    pltpu.make_async_copy(
                        kv_hbm.at[li, h, pid], kv_buf.at[slot, idx],
                        sem.at[0, slot, idx],
                    ).start()
                else:
                    pltpu.make_async_copy(
                        k_hbm.at[h, pid], k_buf.at[slot, idx], sem.at[0, slot, idx]
                    ).start()
                    pltpu.make_async_copy(
                        v_hbm.at[h, pid], v_buf.at[slot, idx], sem.at[1, slot, idx]
                    ).start()

    def wait_chunk(ci, slot):
        base = ci * cp
        for idx in range(cp):
            @pl.when(base + idx < num_pages)
            def _():
                if pool_layout:
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 0, 0], kv_buf.at[slot, idx],
                        sem.at[0, slot, idx],
                    ).wait()
                else:
                    pltpu.make_async_copy(
                        k_hbm.at[h, 0], k_buf.at[slot, idx], sem.at[0, slot, idx]
                    ).wait()
                    pltpu.make_async_copy(
                        v_hbm.at[h, 0], v_buf.at[slot, idx], sem.at[1, slot, idx]
                    ).wait()

            # Unfetched slots hold garbage (can be NaN); the softmax weights
            # for their positions are exactly 0, but 0 * NaN = NaN in p @ v —
            # so zero the value pages (k feeds only masked scores).
            @pl.when(base + idx >= num_pages)
            def _():
                if pool_layout:
                    kv_buf[slot, idx] = jnp.zeros_like(kv_buf[slot, idx])
                else:
                    v_buf[slot, idx] = jnp.zeros_like(v_buf[slot, idx])
                    k_buf[slot, idx] = jnp.zeros_like(k_buf[slot, idx])

    start_chunk(0, 0)  # no-op when num_pages == 0 (guards inside)

    q = q_ref[0, hq]  # [G, hd] f32
    g, hd = q.shape

    def chunk_update(ci, slot, carry):
        """One online-softmax update from the STATICALLY-indexed buffer
        ``slot``. Safe to run past num_chunks: wait_chunk zeroed unfetched
        buffers, every position fails ``pos < past``, so p == 0, pv == 0,
        m/l/acc pass through unchanged (corr == 1).

        Static slot matters: a ``lax.cond(slot == 0, ...)`` buffer select
        copies the whole chunk buffer VMEM→VMEM each iteration — re-copying
        the entire streamed KV once per step (measured: the kernel ran
        compute-bound at ~225 GB/s vs the ~650 GB/s HBM ceiling).

        The MXU dots take bf16 inputs with f32 accumulation (standard flash
        numerics; f32 test pools keep full f32 dots — precision follows the
        KV dtype). An f32 MXU dot runs at a fraction of the bf16 rate.
        """
        m, l, acc = carry
        if pool_layout:
            kv = kv_buf[slot]  # [cp, 2*ps, hd] — k rows then v rows per page
            k = kv[:, :ps, :].reshape(cp * ps, hd)
            v = kv[:, ps:, :].reshape(cp * ps, hd)
        else:
            k = k_buf[slot].reshape(cp * ps, hd)
            v = v_buf[slot].reshape(cp * ps, hd)

        s = jax.lax.dot_general(
            q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, cp*ps] f32 — caller pre-scales q

        pos = ci * cp * ps + jax.lax.broadcasted_iota(
            jnp.int32, (g, cp * ps), 1
        )
        mask = pos < past
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.where(mask, jnp.exp(s - safe_m), 0.0)
        corr = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - safe_m))
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * corr + pv

    def body(pi, carry):
        # pair-unrolled: chunks 2*pi (buffer 0) and 2*pi+1 (buffer 1), so
        # buffer indices are static (see chunk_update docstring)
        ci0 = 2 * pi

        @pl.when(ci0 + 1 < num_chunks)
        def _():
            start_chunk(ci0 + 1, 1)

        wait_chunk(ci0, 0)
        carry = chunk_update(ci0, 0, carry)

        @pl.when(ci0 + 2 < num_chunks)
        def _():
            start_chunk(ci0 + 2, 0)

        wait_chunk(ci0 + 1, 1)
        carry = chunk_update(ci0 + 1, 1, carry)
        return carry

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(
        0, pl.cdiv(num_chunks, 2), body, (m0, l0, acc0))

    if has_cur:
        # current token's key/value from the in-flight tensors (one more
        # online-softmax update; live rows only)
        live = seq_len > 0
        k_cur = cur_k_ref[0, hq, 0].astype(jnp.float32)  # [hd]
        v_cur = cur_v_ref[0, hq, 0].astype(jnp.float32)
        s_cur = jnp.sum(q * k_cur[None, :], axis=1, keepdims=True)  # [G, 1]
        s_cur = jnp.where(live, s_cur, NEG_INF)
        m_new = jnp.maximum(m, s_cur)
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p_cur = jnp.where(live, jnp.exp(s_cur - safe_m), 0.0)
        corr = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - safe_m))
        l = l * corr + p_cur
        acc = acc * corr + p_cur * v_cur[None, :]

    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, hq] = acc / safe_l


@functools.partial(
    jax.jit,
    static_argnames=("scale", "chunk_pages", "interpret", "fold_heads"),
)
def paged_attention_decode(
    q: jax.Array,  # [B, Hq, hd]
    k_pages: jax.Array,  # [Hkv, num_pages, ps, hd] — or, with layer_id, the
    v_pages: jax.Array,  # FULL pool [L, Hkv, num_pages, 2, ps, hd] (twice)
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32 (0 = dead/padding row)
    scale: float,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: bool = False,
    fold_heads: bool = False,  # ONE program per request, kv heads looped
                               # inside — kills the ~14 us/program fixed
                               # cost that dominates short-context decode
    cur_k=None,  # [B, Hkv, hd] — current token's k/v from the in-flight
    cur_v=None,  # tensors (pages then hold only the first seq_len-1 tokens)
    layer_id=None,  # int32 scalar: k/v_pages are the full k/v-adjacent pool
                    # [L, Hkv, pages, 2, ps, hd]; DMA from pool[layer_id, h,
                    # page] — avoids materializing a per-layer slice of a
                    # multi-GB pool inside the layer scan, and fetches a
                    # page's k+v in ONE DMA
) -> jax.Array:
    """Returns [B, Hq, hd] in q.dtype. Contract matches
    ops.attention.paged_attention_decode (incl. the cur_k/cur_v deferred
    page-write form)."""
    B, Hq, hd = q.shape
    pool_layout = layer_id is not None
    if pool_layout:
        L, Hkv, nPg, _, ps, _ = k_pages.shape
        # flatten the page's k/v into one [2*ps, hd] block so the per-page
        # fetch is a single 2-D contiguous DMA (a [2, ps, hd] block copy is
        # split per leading element by Mosaic — measured no win)
        k_pages = v_pages = k_pages.reshape(L, Hkv, nPg, 2 * ps, hd)
        li = jnp.asarray(layer_id, jnp.int32).reshape(1)
    else:
        Hkv, _, ps, _ = k_pages.shape
        li = jnp.zeros((1,), jnp.int32)
    G = Hq // Hkv
    P = page_tables.shape[1]
    cp = min(chunk_pages, P)
    has_cur = cur_k is not None

    qg = (q.astype(jnp.float32) * scale).reshape(B, Hkv, G, hd)
    if not has_cur:
        cur_k = jnp.zeros((B, Hkv, 1, hd), k_pages.dtype)
        cur_v = jnp.zeros((B, Hkv, 1, hd), v_pages.dtype)
    else:
        cur_k = cur_k[:, :, None, :]
        cur_v = cur_v[:, :, None, :]

    if fold_heads:
        cur_spec = pl.BlockSpec((1, Hkv, 1, hd), lambda b, *_: (b, 0, 0, 0))
        q_spec = pl.BlockSpec((1, Hkv, G, hd), lambda b, *_: (b, 0, 0, 0))
        grid = (B,)
        out_spec = pl.BlockSpec((1, Hkv, G, hd), lambda b, *_: (b, 0, 0, 0))
    else:
        cur_spec = pl.BlockSpec((1, 1, 1, hd), lambda b, h, *_: (b, h, 0, 0))
        q_spec = pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0))
        grid = (B, Hkv)
        out_spec = pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0))
    if pool_layout:
        # pass the pool ONCE (duplicating one buffer across two operands can
        # force XLA to materialize a second copy of the multi-GB pool)
        in_specs = [q_spec, pl.BlockSpec(memory_space=pl.ANY), cur_spec, cur_spec]
        operands = (qg, k_pages, cur_k, cur_v)
    else:
        in_specs = [q_spec, pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY), cur_spec, cur_spec]
        operands = (qg, k_pages, v_pages, cur_k, cur_v)

    if pool_layout:
        # single double-buffered k+v scratch; sem axis 0 unused (kept at 2
        # so both layouts share one semaphore shape)
        scratch = [
            pltpu.VMEM((2, cp, 2 * ps, hd), k_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2, cp)),
        ]
    else:
        scratch = [
            pltpu.VMEM((2, cp, ps, hd), k_pages.dtype),
            pltpu.VMEM((2, cp, ps, hd), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2, cp)),
        ]
    out = pl.pallas_call(
        functools.partial(_kernel, cp=cp, ps=ps, has_cur=has_cur,
                          pool_layout=pool_layout, fold_heads=fold_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, hd), jnp.float32),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), seq_lens.astype(jnp.int32), li, *operands)
    return out.reshape(B, Hq, hd).astype(q.dtype)
