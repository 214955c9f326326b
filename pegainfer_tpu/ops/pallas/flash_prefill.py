"""Flash attention for prefill (causal, GQA, single ragged prompt).

The TPU answer to the reference's FlashInfer prefill path
(batch_prefill_paged_cuda, csrc/paged_attention.cu:1-45, CTA_TILE_Q=64):
online-softmax tiles over (q-block, kv-block) with causal block skipping.
Never materializes the [T, T] score matrix — prefill HBM traffic stays
O(T * hd) per head, which is what makes 10k-token TTFT competitive.

Layout: q [T, Hq, hd], k/v [T, Hkv, hd], bf16 in, f32 accumulation.
Grid (Hq, T/TQ, T/TK), kv-block innermost so the output tile accumulates in
VMEM scratch across the kv sweep. Causal blocks strictly above the diagonal
are masked out (their DMA still happens; a fully block-sparse grid is a
later optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(
    seq_len_ref,  # scalar prefetch: [1] int32
    q_ref,  # [1, TQ, hd] (head-major block)
    k_ref,  # [1, TK, hd]
    v_ref,  # [1, TK, hd]
    o_ref,  # [1, TQ, hd]
    m_scr,  # [TQ, 128] f32
    l_scr,  # [TQ, 128] f32
    acc_scr,  # [TQ, hd] f32
    *,
    scale: float,
    tq: int,
    tk: int,
):
    i = pl.program_id(1)  # q block
    j = pl.program_id(2)  # kv block
    nk = pl.num_programs(2)
    seq_len = seq_len_ref[0]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = i * tq
    k_start = j * tk

    # Skip kv blocks entirely above the causal diagonal or past seq_len.
    live = (k_start <= q_start + tq - 1) & (k_start < seq_len)

    @pl.when(live)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [TQ, hd]
        k = k_ref[0].astype(jnp.float32)  # [TK, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [TQ, TK]

        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        mask = (k_pos <= q_pos) & (k_pos < seq_len)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]  # [TQ, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # rows with no live key yet keep m = -inf; guard exp(-inf - -inf)
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(s - safe_m)
        p = jnp.where(mask, p, 0.0)
        corr = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - safe_m))

        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)  # [TK, hd]
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "tq", "tk", "interpret"))
def flash_prefill(
    q: jax.Array,  # [T, Hq, hd]
    k: jax.Array,  # [T, Hkv, hd]
    v: jax.Array,  # [T, Hkv, hd]
    seq_len: jax.Array,  # scalar int32 — valid token count
    scale: float,
    tq: int = 128,
    tk: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Causal GQA flash attention over one padded prompt. Returns [T, Hq, hd].

    Rows at positions >= seq_len hold garbage (contract matches
    ops.attention.prefill_attention).
    """
    T, Hq, hd = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    tq = min(tq, T)
    tk = min(tk, T)
    if T % tq or T % tk:
        raise ValueError(f"T={T} must be a multiple of tq={tq}, tk={tk}")

    grid = (Hq, T // tq, T // tk)
    seq_len_arr = jnp.reshape(seq_len.astype(jnp.int32), (1,))

    # head-major layout so blocks are [1, time, hd] (TPU tiling wants the
    # last two dims aligned; a middle head axis of size 1 is not)
    qh = q.transpose(1, 0, 2)
    kh = k.transpose(1, 0, 2)
    vh = v.transpose(1, 0, 2)

    kernel = functools.partial(_kernel, scale=scale, tq=tq, tk=tk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tq, hd), lambda h, i, j, *_: (h, i, 0)),
                pl.BlockSpec((1, tk, hd), lambda h, i, j, *_: (h // G, j, 0)),
                pl.BlockSpec((1, tk, hd), lambda h, i, j, *_: (h // G, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, tq, hd), lambda h, i, j, *_: (h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((tq, 128), jnp.float32),
                pltpu.VMEM((tq, 128), jnp.float32),
                pltpu.VMEM((tq, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
        interpret=interpret,
    )(seq_len_arr, qh, kh, vh)
    return out.transpose(1, 0, 2)
