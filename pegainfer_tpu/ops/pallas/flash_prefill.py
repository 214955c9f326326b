"""Flash attention for prefill (causal, GQA, prefill-continuation aware).

The TPU answer to the reference's FlashInfer prefill path
(batch_prefill_paged_cuda, csrc/paged_attention.cu:1-45, CTA_TILE_Q=64):
online-softmax tiles over (q-block, kv-block) with causal block skipping.
Never materializes the [T, S] score matrix — prefill HBM traffic stays
O(T * hd) per head.

Shape generality: queries at absolute positions ``q_offset + i`` attend
over a key array of independent length S (``kv_valid`` valid rows) — this
serves both whole-prompt prefill (q_offset=0, S=T) and chunked prefill
continuation (q = one chunk, k/v = the gathered paged KV so far).

Grid (Hkv, T/tq, S/tk): one program computes ALL G query heads of a KV
group, so each K/V tile is DMA'd once per group instead of once per query
head, and the MXU sees [G*tq, hd] x [hd, tk] tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(
    scalars_ref,  # scalar prefetch: [2] int32 = (kv_valid, q_offset)
    q_ref,  # [1, G, TQ, hd]
    k_ref,  # [1, TK, hd]
    v_ref,  # [1, TK, hd]
    o_ref,  # [1, G, TQ, hd]
    m_scr,  # [G*TQ, 128] f32
    l_scr,  # [G*TQ, 128] f32
    acc_scr,  # [G*TQ, hd] f32
    *,
    scale: float,
    g: int,
    tq: int,
    tk: int,
):
    i = pl.program_id(1)  # q block
    j = pl.program_id(2)  # kv block
    nk = pl.num_programs(2)
    kv_valid = scalars_ref[0]
    q_offset = scalars_ref[1]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = q_offset + i * tq  # absolute position of this q tile
    k_start = j * tk

    # Skip kv blocks entirely above the causal diagonal or past kv_valid.
    live = (k_start <= q_start + tq - 1) & (k_start < kv_valid)

    @pl.when(live)
    def _compute():
        hd = q_ref.shape[-1]
        # MXU dots run on the INPUT dtype with f32 accumulation (standard
        # flash numerics): bf16 inputs run the MXU ~6x faster than f32 and
        # prefill attention is MXU-bound. f32 test inputs keep full f32 dots.
        q = q_ref[0].reshape(g * tq, hd)
        k = k_ref[0]  # [TK, hd]
        s = jax.lax.dot_general(
            # dot_general rejects mixed input dtypes — follow the KV dtype
            # when the caller mixes (e.g. bf16 activations, f32 debug pool)
            q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [G*TQ, TK] f32

        row_t = jax.lax.broadcasted_iota(jnp.int32, (g * tq, tk), 0) % tq
        q_pos = q_start + row_t
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (g * tq, tk), 1)
        mask = (k_pos <= q_pos) & (k_pos < kv_valid)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        safe_m = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(s - safe_m)
        p = jnp.where(mask, p, 0.0)
        corr = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - safe_m))

        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        hd = o_ref.shape[-1]
        l = l_scr[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).reshape(g, tq, hd).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "tq", "tk", "interpret")
)
def flash_attention(
    q: jax.Array,  # [T, Hq, hd]
    k: jax.Array,  # [S, Hkv, hd]
    v: jax.Array,  # [S, Hkv, hd]
    kv_valid: jax.Array,  # scalar int32 — valid key count
    q_offset,  # scalar int32 — absolute position of q row 0
    scale: float,
    tq: int = 256,
    tk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Causal GQA flash attention. Returns [T, Hq, hd]; rows whose absolute
    position >= kv_valid hold garbage."""
    T, Hq, hd = q.shape
    S = k.shape[0]
    Hkv = k.shape[1]
    G = Hq // Hkv
    # scoped-VMEM budget: shrink the q tile for wide-head / high-GQA models
    # (hd 256 × G 8 at tq 256 overflows the 16 MB scoped limit)
    while G * tq * hd * 2 > 512 * 1024 and tq > 64:
        tq //= 2
    tq = min(tq, T)
    tk = min(tk, S)
    if T % tq or S % tk:
        raise ValueError(f"T={T}/S={S} must be multiples of tq={tq}, tk={tk}")

    grid = (Hkv, T // tq, S // tk)
    scalars = jnp.stack(
        [jnp.asarray(kv_valid, jnp.int32), jnp.asarray(q_offset, jnp.int32)]
    )

    # head-major + kv-grouped layout: q [Hkv, G, T, hd], k/v [Hkv, S, hd]
    qh = q.reshape(T, Hkv, G, hd).transpose(1, 2, 0, 3)
    kh = k.transpose(1, 0, 2)
    vh = v.transpose(1, 0, 2)

    kernel = functools.partial(_kernel, scale=scale, g=G, tq=tq, tk=tk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, G, tq, hd), lambda h, i, j, *_: (h, 0, i, 0)),
                pl.BlockSpec((1, tk, hd), lambda h, i, j, *_: (h, j, 0)),
                pl.BlockSpec((1, tk, hd), lambda h, i, j, *_: (h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, G, tq, hd), lambda h, i, j, *_: (h, 0, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((G * tq, 128), jnp.float32),
                pltpu.VMEM((G * tq, 128), jnp.float32),
                pltpu.VMEM((G * tq, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
        interpret=interpret,
    )(scalars, qh, kh, vh)
    return out.transpose(2, 0, 1, 3).reshape(T, Hq, hd)


def flash_prefill(q, k, v, seq_len, scale, tq: int = 256, tk: int = 512,
                  interpret: bool = False):
    """Whole-prompt causal flash attention (q_offset = 0)."""
    return flash_attention(q, k, v, seq_len, 0, scale, tq=tq, tk=tk,
                           interpret=interpret)
