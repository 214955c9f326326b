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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(
    # scalar prefetch
    tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [1, 1, G, hd] f32 (VMEM block)
    k_hbm,  # [Hkv, num_pages, ps, hd] (ANY)
    v_hbm,  # [Hkv, num_pages, ps, hd] (ANY)
    # output
    o_ref,  # [1, 1, G, hd] f32
    # scratch
    k_buf,  # [2, CP, ps, hd] kv dtype
    v_buf,  # [2, CP, ps, hd]
    sem,  # DMA sems [2, 2, CP]
    *,
    cp: int,
    ps: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    seq_len = seq_lens_ref[b]
    num_pages = jnp.maximum(pl.cdiv(seq_len, ps), 0)
    num_chunks = pl.cdiv(num_pages, cp)

    def start_chunk(ci, slot):
        base = ci * cp
        for idx in range(cp):  # static unroll: cp small (4-8)
            @pl.when(base + idx < num_pages)
            def _():
                pid = tables_ref[b, base + idx]
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
                v_buf[slot, idx] = jnp.zeros_like(v_buf[slot, idx])
                k_buf[slot, idx] = jnp.zeros_like(k_buf[slot, idx])

    @pl.when(num_chunks > 0)
    def _run():
        start_chunk(0, 0)

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
            mask = pos < seq_len
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
        _, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = acc / safe_l

    @pl.when(num_chunks == 0)
    def _dead_row():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])


@functools.partial(
    jax.jit, static_argnames=("scale", "chunk_pages", "interpret")
)
def paged_attention_decode(
    q: jax.Array,  # [B, Hq, hd]
    k_pages: jax.Array,  # [Hkv, num_pages, ps, hd]
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32 (0 = dead/padding row)
    scale: float,
    chunk_pages: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Hq, hd] in q.dtype. Contract matches
    ops.attention.paged_attention_decode."""
    B, Hq, hd = q.shape
    Hkv, _, ps, _ = k_pages.shape
    G = Hq // Hkv
    P = page_tables.shape[1]
    cp = min(chunk_pages, P)

    qg = (q.astype(jnp.float32) * scale).reshape(B, Hkv, G, hd)

    out = pl.pallas_call(
        functools.partial(_kernel, cp=cp, ps=ps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Hkv),
            in_specs=[
                pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, h, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, cp, ps, hd), k_pages.dtype),
                pltpu.VMEM((2, cp, ps, hd), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2, cp)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, hd), jnp.float32),
        interpret=interpret,
    )(page_tables.astype(jnp.int32), seq_lens.astype(jnp.int32), qg, k_pages, v_pages)
    return out.reshape(B, Hq, hd).astype(q.dtype)
