"""Paged-KV attention: XLA reference implementations.

Device KV layout (per layer): ``k_pages, v_pages: [num_kv_heads, num_pages,
page_size, head_dim]`` — *head-major*, so (a) one TP shard owns whole kv
heads and pages stay contiguous per shard, and (b) the Pallas decode kernel's
per-(request, head) page DMAs are contiguous ``[page_size, head_dim]``
blocks. The engines' FULL pool form is additionally *k/v-adjacent*:
``[L, Hkv, pages, 2, page_size, head_dim]`` (qwen3.make_kv_pages), so one
DMA fetches a page's k AND v. Page id 0 is the null page (padding rows
write there). A request's
pages are listed in its page table row; token ``t`` of a request lives at
page ``table[t // page_size]``, slot ``t % page_size``.

These XLA implementations are the correctness reference (and the CPU-test
path) for the Pallas kernels in ``ops/pallas`` which stream pages HBM→VMEM
directly. Functional parity targets in the reference engine:
paged_attention_decode_cuda / batch_prefill_paged_cuda
(pegainfer-kernels/csrc/paged_attention.cu, KERNELS.md:19-21).

All softmax math in f32; outputs cast back to the query dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = float(jnp.finfo(jnp.float32).min)


# ── KV page writes ───────────────────────────────────────────────────────


def write_kv_decode(k_pages, v_pages, k_new, v_new, page_ids, slots):
    """Scatter one token per batch row.

    k_pages/v_pages: [Hkv, num_pages, page_size, hd]; k_new/v_new:
    [B, Hkv, hd]; page_ids, slots: [B] int32. Padding rows must point at the
    null page.
    """
    k_t = k_new.transpose(1, 0, 2).astype(k_pages.dtype)  # [Hkv, B, hd]
    v_t = v_new.transpose(1, 0, 2).astype(v_pages.dtype)
    k_pages = k_pages.at[:, page_ids, slots].set(k_t)
    v_pages = v_pages.at[:, page_ids, slots].set(v_t)
    return k_pages, v_pages


def write_kv_prefill(k_pages, v_pages, k_new, v_new, page_table):
    """Page-granular scatter of a whole (padded) prompt.

    k_new/v_new: [T, Hkv, hd] with T == len(page_table) * page_size.
    Unused table entries must be the null page (duplicate null indices are
    fine — the null page holds garbage by contract).
    """
    num_pages = page_table.shape[0]
    page_size = k_new.shape[0] // num_pages
    # [T, Hkv, hd] → [Hkv, num_pages, page_size, hd]
    kp = k_new.reshape(num_pages, page_size, *k_new.shape[1:]).transpose(2, 0, 1, 3)
    vp = v_new.reshape(num_pages, page_size, *v_new.shape[1:]).transpose(2, 0, 1, 3)
    k_pages = k_pages.at[:, page_table].set(kp.astype(k_pages.dtype))
    v_pages = v_pages.at[:, page_table].set(vp.astype(v_pages.dtype))
    return k_pages, v_pages


# ── Decode attention ─────────────────────────────────────────────────────


def paged_attention_decode(q, k_pages, v_pages, page_tables, seq_lens, scale,
                           cur_k=None, cur_v=None):
    """GQA decode attention over paged KV (XLA gather reference).

    q: [B, Hq, hd]; page_tables: [B, P] int32; seq_lens: [B] int32 — the
    number of valid tokens INCLUDING the one written this step.
    Returns [B, Hq, hd] in q.dtype.

    With ``cur_k/cur_v`` ([B, Hkv, hd]): the CURRENT token's k/v come from
    these in-flight tensors instead of the pages (the pages then only need
    the first seq_len-1 tokens) — this lets the caller defer the page
    scatter to one fused write outside the layer scan, which avoids
    pool-sized carry copies (docs/PERF.md).
    """
    B, Hq, hd = q.shape
    P = page_tables.shape[1]
    Hkv = k_pages.shape[0]
    page_size = k_pages.shape[2]
    G = Hq // Hkv
    S = P * page_size

    # Gather this batch's KV: [Hkv, B, P, page_size, hd] → [Hkv, B, S, hd]
    k = k_pages[:, page_tables].reshape(Hkv, B, S, hd)
    v = v_pages[:, page_tables].reshape(Hkv, B, S, hd)

    past = seq_lens if cur_k is None else jnp.maximum(seq_lens - 1, 0)
    qg = q.reshape(B, Hkv, G, hd).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bhgd,hbsd->bhgs", qg, kf) * scale  # [B, Hkv, G, S]

    pos = lax.broadcasted_iota(jnp.int32, (B, 1, 1, S), 3)
    mask = pos < past[:, None, None, None]
    scores = jnp.where(mask, scores, NEG_INF)

    if cur_k is not None:
        s_cur = jnp.einsum(
            "bhgd,bhd->bhg", qg, cur_k.astype(jnp.float32)
        )[..., None] * scale  # [B, Hkv, G, 1]
        live = (seq_lens > 0)[:, None, None, None]
        s_cur = jnp.where(live, s_cur, NEG_INF)
        scores = jnp.concatenate([scores, s_cur], axis=-1)
        vf = jnp.concatenate(
            [
                v.astype(jnp.float32).transpose(1, 0, 2, 3),  # [B, Hkv, S, hd]
                cur_v.astype(jnp.float32)[:, :, None, :],
            ],
            axis=2,
        )  # [B, Hkv, S+1, hd]
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhgs,bhsd->bhgd", probs, vf)
        return out.reshape(B, Hq, hd).astype(q.dtype)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,hbsd->bhgd", probs, v.astype(jnp.float32))
    return out.reshape(B, Hq, hd).astype(q.dtype)


def chunk_attention_seq(q, k_seq, v_seq, start_pos, scale, q_chunk: int = 128):
    """Prefill-continuation attention over EXPLICIT key/value sequences.

    q: [Tc, Hq, hd] (chunk rows at absolute positions start_pos + i);
    k_seq/v_seq: [S, Hkv, hd] laid out by absolute position (0..S); entries
    at positions >= start_pos + Tc may be garbage (causally masked). Used by
    the write-ahead chunk prefill, where the chunk's own k/v are spliced
    into the gathered past instead of read back from the pool.
    Returns [Tc, Hq, hd] in q.dtype.
    """
    Tc, Hq, hd = q.shape
    S, Hkv, _ = k_seq.shape
    G = Hq // Hkv
    kf = k_seq.astype(jnp.float32)
    vf = v_seq.astype(jnp.float32)
    key_pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)

    if Tc % q_chunk != 0:
        q_chunk = Tc
    nc = Tc // q_chunk

    def one_chunk(ci):
        qs = lax.dynamic_slice_in_dim(q, ci * q_chunk, q_chunk, axis=0)
        qg = qs.reshape(q_chunk, Hkv, G, hd).astype(jnp.float32)
        scores = jnp.einsum("thgd,shd->thgs", qg, kf) * scale
        q_pos = (
            start_pos + ci * q_chunk
            + lax.broadcasted_iota(jnp.int32, (q_chunk, 1, 1, 1), 0)
        )
        mask = key_pos <= q_pos
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("thgs,shd->thgd", probs, vf)
        return out.reshape(q_chunk, Hq, hd)

    out = lax.map(one_chunk, jnp.arange(nc))
    return out.reshape(Tc, Hq, hd).astype(q.dtype)


def chunk_paged_attention(q, k_pages, v_pages, page_table, start_pos, scale,
                          q_chunk: int = 128):
    """Prefill-continuation attention: a chunk of queries over ONE request's
    paged KV (gathered once — all rows share the table).

    q: [Tc, Hq, hd] (chunk rows at positions start_pos + i); page_table: [P];
    the chunk's own KV must already be written. Returns [Tc, Hq, hd].
    """
    Tc, Hq, hd = q.shape
    Hkv = k_pages.shape[0]
    G = Hq // Hkv
    P = page_table.shape[0]
    S = P * k_pages.shape[2]

    k = k_pages[:, page_table].reshape(Hkv, S, hd).astype(jnp.float32)
    v = v_pages[:, page_table].reshape(Hkv, S, hd).astype(jnp.float32)
    key_pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)

    if Tc % q_chunk != 0:
        q_chunk = Tc
    nc = Tc // q_chunk

    def one_chunk(ci):
        qs = lax.dynamic_slice_in_dim(q, ci * q_chunk, q_chunk, axis=0)
        qg = qs.reshape(q_chunk, Hkv, G, hd).astype(jnp.float32)
        scores = jnp.einsum("thgd,hsd->thgs", qg, k) * scale
        q_pos = (
            start_pos + ci * q_chunk
            + lax.broadcasted_iota(jnp.int32, (q_chunk, 1, 1, 1), 0)
        )
        mask = key_pos <= q_pos
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("thgs,hsd->thgd", probs, v)
        return out.reshape(q_chunk, Hq, hd)

    out = lax.map(one_chunk, jnp.arange(nc))
    return out.reshape(Tc, Hq, hd).astype(q.dtype)


# ── Prefill attention ────────────────────────────────────────────────────


def prefill_attention(q, k, v, seq_len, scale, q_chunk: int = 256):
    """Causal self-attention over one (padded) prompt, chunked over queries.

    q: [T, Hq, hd]; k, v: [T, Hkv, hd]; seq_len: valid token count (dynamic).
    Rows past seq_len produce garbage (masked by the caller's use).
    Returns [T, Hq, hd] in q.dtype.
    """
    T, Hq, hd = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    if T % q_chunk != 0:
        q_chunk = T  # small inputs: single chunk
    nc = T // q_chunk

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    key_pos = lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3)

    def one_chunk(ci):
        qs = lax.dynamic_slice_in_dim(q, ci * q_chunk, q_chunk, axis=0)
        qg = qs.reshape(q_chunk, Hkv, G, hd).astype(jnp.float32)
        scores = jnp.einsum("thgd,shd->hgts", qg, kf) * scale  # [Hkv,G,C,T]
        scores = scores.transpose(2, 0, 1, 3)  # [C, Hkv, G, T]
        q_pos = (ci * q_chunk + lax.broadcasted_iota(jnp.int32, (q_chunk, 1, 1, 1), 0))
        mask = (key_pos <= q_pos) & (key_pos < seq_len)
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("thgs,shd->thgd", probs, vf)
        return out.reshape(q_chunk, Hq, hd)

    out = lax.map(one_chunk, jnp.arange(nc))
    return out.reshape(T, Hq, hd).astype(q.dtype)
