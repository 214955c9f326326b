"""Pallas kernels vs XLA reference implementations (interpret mode on CPU).

Reference analog: pegainfer-kernels/tests/* (kernels vs reference math,
SURVEY.md §4). The XLA implementations in ops.attention are themselves
HF-parity-tested (test_qwen3_parity), so agreement here chains to the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.ops import attention as att
from pegainfer_tpu.ops.pallas.flash_prefill import flash_prefill
from pegainfer_tpu.ops.pallas.paged_decode import paged_attention_decode


def rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


@pytest.mark.parametrize("T,seq_len,Hq,Hkv,hd,tq,tk", [
    (128, 128, 4, 2, 64, 64, 64),
    (256, 200, 8, 2, 64, 128, 128),
    (128, 37, 4, 4, 128, 64, 64),
    (512, 512, 2, 1, 64, 128, 256),
])
def test_flash_prefill_matches_reference(T, seq_len, Hq, Hkv, hd, tq, tk):
    q = rand(0, (T, Hq, hd))
    k = rand(1, (T, Hkv, hd))
    v = rand(2, (T, Hkv, hd))
    scale = hd ** -0.5
    ref = att.prefill_attention(q, k, v, jnp.int32(seq_len), scale)
    out = flash_prefill(q, k, v, jnp.int32(seq_len), scale, tq=tq, tk=tk,
                        interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[:seq_len]), np.asarray(ref[:seq_len]), rtol=2e-5, atol=2e-5
    )


def test_flash_prefill_bf16():
    T, Hq, Hkv, hd = 128, 4, 2, 64
    q = rand(0, (T, Hq, hd), jnp.bfloat16)
    k = rand(1, (T, Hkv, hd), jnp.bfloat16)
    v = rand(2, (T, Hkv, hd), jnp.bfloat16)
    ref = att.prefill_attention(q, k, v, jnp.int32(100), hd ** -0.5)
    out = flash_prefill(q, k, v, jnp.int32(100), hd ** -0.5, tq=64, tk=64,
                        interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[:100], np.float32), np.asarray(ref[:100], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def _paged_setup(key, B, Hq, Hkv, hd, num_pages, ps, P, seq_lens):
    """Build consistent paged KV + tables for the given per-row seq lens."""
    rng = np.random.default_rng(key)
    k_pages = rand(3, (Hkv, num_pages, ps, hd))
    v_pages = rand(4, (Hkv, num_pages, ps, hd))
    tables = np.zeros((B, P), np.int32)
    next_page = 1
    for b, sl in enumerate(seq_lens):
        n = -(-sl // ps)
        assert next_page + n <= num_pages
        tables[b, :n] = np.arange(next_page, next_page + n)
        next_page += n
    q = rand(5, (B, Hq, hd))
    return q, k_pages, v_pages, jnp.asarray(tables), jnp.asarray(seq_lens, jnp.int32)


@pytest.mark.parametrize("B,Hq,Hkv,hd,ps,P,seq_lens,cp", [
    (1, 4, 2, 64, 8, 8, [40], 2),
    (4, 8, 4, 64, 8, 16, [1, 63, 128, 17], 4),
    (2, 4, 1, 128, 16, 8, [100, 9], 8),
    (3, 4, 2, 64, 8, 8, [33, 0, 5], 2),  # dead row (seq_len 0)
])
def test_paged_decode_matches_reference(B, Hq, Hkv, hd, ps, P, seq_lens, cp):
    q, kp, vp, tables, sl = _paged_setup(0, B, Hq, Hkv, hd, 64, ps, P, seq_lens)
    scale = hd ** -0.5
    ref = att.paged_attention_decode(q, kp, vp, tables, sl, scale)
    out = paged_attention_decode(q, kp, vp, tables, sl, scale,
                                 chunk_pages=cp, interpret=True)
    ref = np.asarray(ref)
    out = np.asarray(out)
    for b, s in enumerate(seq_lens):
        if s > 0:
            np.testing.assert_allclose(out[b], ref[b], rtol=2e-5, atol=2e-5)
        else:
            np.testing.assert_array_equal(out[b], 0.0)


def test_paged_decode_bf16_kv():
    B, Hq, Hkv, hd, ps, P = 2, 8, 2, 64, 8, 8
    q, kp, vp, tables, sl = _paged_setup(1, B, Hq, Hkv, hd, 32, ps, P, [40, 21])
    kp = kp.astype(jnp.bfloat16)
    vp = vp.astype(jnp.bfloat16)
    q = q.astype(jnp.bfloat16)
    scale = hd ** -0.5
    ref = att.paged_attention_decode(q, kp, vp, tables, sl, scale)
    out = paged_attention_decode(q, kp, vp, tables, sl, scale,
                                 chunk_pages=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize("B,Hq,Hkv,hd,ps,P,seq_lens,cp", [
    (1, 4, 2, 64, 8, 8, [40], 2),
    (4, 8, 4, 64, 8, 16, [1, 63, 128, 17], 4),
    (3, 4, 2, 64, 8, 8, [33, 0, 5], 2),  # dead row (seq_len 0)
    (2, 4, 2, 64, 8, 8, [8, 9], 4),  # seq_len-1 exactly page-aligned
])
def test_paged_decode_cur_kv(B, Hq, Hkv, hd, ps, P, seq_lens, cp):
    """cur_k/cur_v form: pages hold tokens [0, sl-1); current token's k/v
    arrive in-flight. Must equal full-page attention with the current token
    written at position sl-1."""
    q, kp, vp, tables, sl = _paged_setup(7, B, Hq, Hkv, hd, 64, ps, P, seq_lens)
    cur_k = rand(8, (B, Hkv, hd))
    cur_v = rand(9, (B, Hkv, hd))
    scale = hd ** -0.5
    # reference: scatter the current token INTO the pages, run the plain form
    page_ids = jnp.take_along_axis(
        tables, (jnp.maximum(sl - 1, 0) // ps)[:, None], axis=1)[:, 0]
    slots = jnp.maximum(sl - 1, 0) % ps
    kp_full, vp_full = att.write_kv_decode(kp, vp, cur_k, cur_v, page_ids, slots)
    ref = np.asarray(att.paged_attention_decode(q, kp_full, vp_full, tables, sl, scale))
    # XLA cur-kv form
    out_x = np.asarray(att.paged_attention_decode(
        q, kp, vp, tables, sl, scale, cur_k=cur_k, cur_v=cur_v))
    # Pallas cur-kv form (interpret)
    out_p = np.asarray(paged_attention_decode(
        q, kp, vp, tables, sl, scale, chunk_pages=cp, interpret=True,
        cur_k=cur_k, cur_v=cur_v))
    for b, s in enumerate(seq_lens):
        if s > 0:
            np.testing.assert_allclose(out_x[b], ref[b], rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(out_p[b], ref[b], rtol=2e-5, atol=2e-5)
        else:
            np.testing.assert_array_equal(out_p[b], 0.0)


def test_paged_decode_pool_layout():
    """Full-pool form: kernel DMAs from pool[layer_id, 0|1] directly."""
    B, Hq, Hkv, hd, ps, P = 2, 8, 2, 64, 8, 8
    L = 3
    q, kp, vp, tables, sl = _paged_setup(11, B, Hq, Hkv, hd, 32, ps, P, [40, 21])
    cur_k = rand(12, (B, Hkv, hd))
    cur_v = rand(13, (B, Hkv, hd))
    scale = hd ** -0.5
    # k/v-adjacent pool with layer 1 holding (kp, vp); other layers noise
    pool = rand(14, (L, Hkv, 32, 2, ps, hd))
    pool = pool.at[1, :, :, 0].set(kp).at[1, :, :, 1].set(vp)
    ref = np.asarray(att.paged_attention_decode(
        q, kp, vp, tables, sl, scale, cur_k=cur_k, cur_v=cur_v))
    out = np.asarray(paged_attention_decode(
        q, pool, pool, tables, sl, scale, chunk_pages=4, interpret=True,
        cur_k=cur_k, cur_v=cur_v, layer_id=jnp.int32(1)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_flash_attention_chunk_continuation():
    """flash_attention with q_offset == chunk_paged_attention semantics."""
    from pegainfer_tpu.ops.pallas.flash_prefill import flash_attention

    T_prev, Tc, Hq, Hkv, hd = 24, 16, 4, 2, 64
    S = 64
    q = rand(10, (Tc, Hq, hd))
    k = rand(11, (S, Hkv, hd))
    v = rand(12, (S, Hkv, hd))
    scale = hd ** -0.5
    out = flash_attention(q, k, v, jnp.int32(T_prev + Tc), jnp.int32(T_prev),
                          scale, tq=16, tk=32, interpret=True)
    # dense reference with explicit masks
    qg = np.asarray(q).reshape(Tc, Hkv, 2, hd)
    kf = np.asarray(k)
    vf = np.asarray(v)
    for t in range(Tc):
        pos = T_prev + t
        for h in range(Hkv):
            for g in range(2):
                logits = (qg[t, h, g] @ kf[: pos + 1, h].T) * scale
                p = np.exp(logits - logits.max())
                p /= p.sum()
                ref = p @ vf[: pos + 1, h]
                np.testing.assert_allclose(
                    np.asarray(out)[t, h * 2 + g], ref, rtol=2e-5, atol=2e-5
                )


def test_paged_decode_pool_layout_bf16():
    """Production numerics: bf16 pool -> the kernel's MXU dots run on bf16
    inputs with f32 accumulation (flash numerics). Compare against the f32
    XLA oracle at bf16-scale tolerance, and require argmax-over-head
    agreement (what sampling consumes downstream is logits built from o)."""
    B, Hq, Hkv, hd, ps, P = 2, 8, 2, 64, 8, 8
    L = 3
    q, kp, vp, tables, sl = _paged_setup(21, B, Hq, Hkv, hd, 32, ps, P, [40, 21])
    q = q.astype(jnp.bfloat16)
    cur_k = rand(22, (B, Hkv, hd), jnp.bfloat16)
    cur_v = rand(23, (B, Hkv, hd), jnp.bfloat16)
    scale = hd ** -0.5
    pool = jnp.zeros((L, Hkv, 32, 2, ps, hd), jnp.bfloat16)
    pool = pool.at[1, :, :, 0].set(kp.astype(jnp.bfloat16))
    pool = pool.at[1, :, :, 1].set(vp.astype(jnp.bfloat16))
    ref = np.asarray(att.paged_attention_decode(
        q.astype(jnp.float32), kp, vp, tables, sl, scale,
        cur_k=cur_k.astype(jnp.float32), cur_v=cur_v.astype(jnp.float32)),
        np.float32)
    out = np.asarray(paged_attention_decode(
        q, pool, pool, tables, sl, scale, chunk_pages=4, interpret=True,
        cur_k=cur_k, cur_v=cur_v, layer_id=jnp.int32(1)), np.float32)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(out.reshape(B * Hq, hd).argmax(-1),
                                  ref.reshape(B * Hq, hd).argmax(-1))
