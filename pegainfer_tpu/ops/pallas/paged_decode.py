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
# per-chunk control overhead at long context — scripts/decode_context_sweep.py)
DEFAULT_CHUNK_PAGES = int(os.environ.get("PEGAINFER_CHUNK_PAGES", "8"))


def _kernel(
    # scalar prefetch
    tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    layer_ref,  # [1] int32 (layer index into a full pool; 0 for 4-D layouts)
    # inputs: q, then ONE pool ref ([L, 2, Hkv, pages, ps, hd], pool layout)
    # or TWO per-layer refs (k/v [Hkv, pages, ps, hd]), then cur k/v
    # output: o_ref; scratch: k_buf, v_buf, sem
    *refs,
    cp: int,
    ps: int,
    has_cur: bool,
    pool_layout: bool,
):
    if pool_layout:
        q_ref, kv_hbm, cur_k_ref, cur_v_ref, o_ref, k_buf, v_buf, sem = refs
        k_hbm = v_hbm = kv_hbm
    else:
        q_ref, k_hbm, v_hbm, cur_k_ref, cur_v_ref, o_ref, k_buf, v_buf, sem = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    seq_len = seq_lens_ref[b]
    past = jnp.maximum(seq_len - 1, 0) if has_cur else seq_len
    num_pages = jnp.maximum(pl.cdiv(past, ps), 0)
    num_chunks = pl.cdiv(num_pages, cp)
    li = layer_ref[0]

    def _src(hbm, kv_idx, pid):
        # pool layout: index (layer, k|v, head, page) into the full pool so
        # no per-layer slice is ever materialized; 4-D: [Hkv, pages, ...].
        if pool_layout:
            return hbm.at[li, kv_idx, h, pid]
        return hbm.at[h, pid]

    def start_chunk(ci, slot):
        base = ci * cp
        for idx in range(cp):  # static unroll: cp small (4-8)
            @pl.when(base + idx < num_pages)
            def _():
                pid = tables_ref[b, base + idx]
                pltpu.make_async_copy(
                    _src(k_hbm, 0, pid), k_buf.at[slot, idx], sem.at[0, slot, idx]
                ).start()
                pltpu.make_async_copy(
                    _src(v_hbm, 1, pid), v_buf.at[slot, idx], sem.at[1, slot, idx]
                ).start()

    def wait_chunk(ci, slot):
        base = ci * cp
        for idx in range(cp):
            @pl.when(base + idx < num_pages)
            def _():
                pltpu.make_async_copy(
                    _src(k_hbm, 0, 0), k_buf.at[slot, idx], sem.at[0, slot, idx]
                ).wait()
                pltpu.make_async_copy(
                    _src(v_hbm, 1, 0), v_buf.at[slot, idx], sem.at[1, slot, idx]
                ).wait()

            # Unfetched slots hold garbage (can be NaN); the softmax weights
            # for their positions are exactly 0, but 0 * NaN = NaN in p @ v —
            # so zero the value pages (k feeds only masked scores).
            @pl.when(base + idx >= num_pages)
            def _():
                v_buf[slot, idx] = jnp.zeros_like(v_buf[slot, idx])
                k_buf[slot, idx] = jnp.zeros_like(k_buf[slot, idx])

    start_chunk(0, 0)  # no-op when num_pages == 0 (guards inside)

    q = q_ref[0, 0]  # [G, hd] f32
    g, hd = q.shape

    def body(ci, carry):
        m, l, acc = carry
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < num_chunks)
        def _():
            start_chunk(ci + 1, 1 - slot)

        wait_chunk(ci, slot)
        k = jax.lax.cond(
            slot == 0, lambda: k_buf[0], lambda: k_buf[1]
        ).reshape(cp * ps, hd).astype(jnp.float32)
        v = jax.lax.cond(
            slot == 0, lambda: v_buf[0], lambda: v_buf[1]
        ).reshape(cp * ps, hd).astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, cp*ps] — caller pre-scales q

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
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc * corr + pv

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    if has_cur:
        # current token's key/value from the in-flight tensors (one more
        # online-softmax update; live rows only)
        live = seq_len > 0
        k_cur = cur_k_ref[0, 0, 0].astype(jnp.float32)  # [hd]
        v_cur = cur_v_ref[0, 0, 0].astype(jnp.float32)
        s_cur = jnp.sum(q * k_cur[None, :], axis=1, keepdims=True)  # [G, 1]
        s_cur = jnp.where(live, s_cur, NEG_INF)
        m_new = jnp.maximum(m, s_cur)
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p_cur = jnp.where(live, jnp.exp(s_cur - safe_m), 0.0)
        corr = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - safe_m))
        l = l * corr + p_cur
        acc = acc * corr + p_cur * v_cur[None, :]

    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = acc / safe_l


@functools.partial(
    jax.jit, static_argnames=("scale", "chunk_pages", "interpret")
)
def paged_attention_decode(
    q: jax.Array,  # [B, Hq, hd]
    k_pages: jax.Array,  # [Hkv, num_pages, ps, hd] — or, with layer_id, the
    v_pages: jax.Array,  # FULL pool [L, 2, Hkv, num_pages, ps, hd] (twice)
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32 (0 = dead/padding row)
    scale: float,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: bool = False,
    cur_k=None,  # [B, Hkv, hd] — current token's k/v from the in-flight
    cur_v=None,  # tensors (pages then hold only the first seq_len-1 tokens)
    layer_id=None,  # int32 scalar: k/v_pages are the full pool; DMA from
                    # pool[layer_id, 0|1] — avoids materializing a per-layer
                    # slice of a multi-GB pool inside the layer scan
) -> jax.Array:
    """Returns [B, Hq, hd] in q.dtype. Contract matches
    ops.attention.paged_attention_decode (incl. the cur_k/cur_v deferred
    page-write form)."""
    B, Hq, hd = q.shape
    pool_layout = layer_id is not None
    if pool_layout:
        _, _, Hkv, _, ps, _ = k_pages.shape
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

    cur_spec = pl.BlockSpec((1, 1, 1, hd), lambda b, h, *_: (b, h, 0, 0))
    q_spec = pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0))
    if pool_layout:
        # pass the pool ONCE (duplicating one buffer across two operands can
        # force XLA to materialize a second copy of the multi-GB pool)
        in_specs = [q_spec, pl.BlockSpec(memory_space=pl.ANY), cur_spec, cur_spec]
        operands = (qg, k_pages, cur_k, cur_v)
    else:
        in_specs = [q_spec, pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY), cur_spec, cur_spec]
        operands = (qg, k_pages, v_pages, cur_k, cur_v)

    out = pl.pallas_call(
        functools.partial(_kernel, cp=cp, ps=ps, has_cur=has_cur,
                          pool_layout=pool_layout),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Hkv),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, cp, ps, hd), k_pages.dtype),
                pltpu.VMEM((2, cp, ps, hd), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2, cp)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, hd), jnp.float32),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), seq_lens.astype(jnp.int32), li, *operands)
    return out.reshape(B, Hq, hd).astype(q.dtype)
