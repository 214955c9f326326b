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


# ── FP4 fused dequant-GEMV (ops/pallas/fp4_gemm.py) ──────────────────────
# Reference analog: TileLang moe_fp4_grouped kernels
# (deepseek_quant.cu:1-1272) — dequant inside the GEMM so expert weight
# traffic stays ∝ 0.5 B/param.


@pytest.mark.parametrize(
    "E,OUT,IN,group",
    [
        (4, 64, 256, 32),     # standard 32-group scales
        (4, 256, 512, 32),    # multi-tile OUT
        (2, 32, 256, 256),    # whole-row group (S=1 after grouping)
        (8, 64, 1024, 32),    # wide IN
    ],
)
def test_fp4_gemv_matches_oracle(E, OUT, IN, group):
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas.fp4_gemm import (
        fp4_gemv_supported, moe_fp4_gemv,
    )

    rng = np.random.default_rng(E + OUT + IN)
    w = rng.standard_normal((E, OUT, IN)).astype(np.float32) * 0.1
    cont = quant.quantize_fp4_stack(w, group=group)
    assert fp4_gemv_supported(cont["q"], cont["s"])
    M = 12
    x = rng.standard_normal((M, IN)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)

    y = moe_fp4_gemv(jnp.asarray(x), cont["q"], cont["s"], idx,
                     interpret=True)
    # oracle: bf16 gather-dequant (exact values) + bf16-x dot, f32 accum —
    # the same numerics contract the kernel implements
    wb = quant.gather_dequant(cont, idx, jnp.bfloat16)
    y_ref = jax.lax.dot_general(
        jnp.asarray(x, jnp.bfloat16)[:, None, :], wb,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0, atol=2e-5)


def test_fp4_gemv_unsupported_shapes():
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas.fp4_gemm import fp4_gemv_supported

    w = np.ones((2, 16, 16), np.float32)  # IN2=8 < 128 lanes
    cont = quant.quantize_fp4_stack(w, group=16)
    assert not fp4_gemv_supported(cont["q"], cont["s"])


def test_dsv4_decode_fp4_kernel_path():
    """Full DSv4 decode with the fused kernel (interpret) == XLA gather
    fallback — the engine-path equality for the kernel swap."""
    from pegainfer_tpu.models import dsv4

    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=256, moe_inter_dim=256, n_layers=2,
        num_attention_heads=8, head_dim=32, q_lora_rank=32,
        qk_rope_head_dim=16, o_groups=8, o_lora_rank=8, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=32, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4), yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.quantize_params_resident(
        dsv4.init_random_params(cfg, seed=9, dtype=jnp.float32, scale=0.08)
    )
    toks = jnp.asarray([3, 17, 42, 9, 88], jnp.int32)
    state = dsv4.make_state(cfg, 1, 16)
    _, st = dsv4.prefill(cfg, params, toks, state=state, slot=jnp.int32(0))
    step = jnp.asarray([7], jnp.int32)
    pos = jnp.asarray([5], jnp.int32)
    slots = jnp.asarray([0], jnp.int32)

    try:
        dsv4.set_fp4_kernel("interpret")
        _, lg_k = dsv4.decode(cfg, params, st, step, pos, slots)
    finally:
        dsv4.set_fp4_kernel(False)
    _, lg_x = dsv4.decode(cfg, params, st, step, pos, slots)
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_x),
                               rtol=0, atol=2e-2)
    assert int(jnp.argmax(lg_k[0])) == int(jnp.argmax(lg_x[0]))


@pytest.mark.parametrize("OUT,IN,block", [(256, 256, 128), (512, 384, 128),
                                          (256, 256, 256)])
def test_fp8_gemv_matches_oracle(OUT, IN, block):
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas.fp4_gemm import fp8_gemv, fp8_gemv_supported

    rng = np.random.default_rng(OUT + IN)
    w = rng.standard_normal((OUT, IN)).astype(np.float32) * 0.1
    cont = quant.quantize_fp8_tensor(w, block=block)
    x = jnp.asarray(rng.standard_normal((3, IN)).astype(np.float32))
    assert fp8_gemv_supported(cont["q"], cont["s"], x)
    y = fp8_gemv(x, cont["q"], cont["s"], interpret=True)
    wd = quant.dequant_any(cont, jnp.bfloat16)
    y_ref = jax.lax.dot_general(
        x.astype(jnp.bfloat16), wd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0, atol=2e-5)


def test_dsv4_decode_fp8_kernel_path():
    """DSv4 decode with BOTH fused kernels (fp4 experts + fp8 dense
    linears, interpret) == the XLA fallback."""
    from pegainfer_tpu.models import dsv4
    from pegainfer_tpu.ops import quant

    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=256, moe_inter_dim=256, n_layers=2,
        num_attention_heads=8, head_dim=32, q_lora_rank=256,
        qk_rope_head_dim=16, o_groups=8, o_lora_rank=32, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=32, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4), yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.quantize_params_resident(
        dsv4.init_random_params(cfg, seed=9, dtype=jnp.float32, scale=0.08)
    )
    toks = jnp.asarray([3, 17, 42, 9, 88], jnp.int32)
    state = dsv4.make_state(cfg, 1, 16)
    _, st = dsv4.prefill(cfg, params, toks, state=state, slot=jnp.int32(0))
    step = jnp.asarray([7], jnp.int32)
    pos = jnp.asarray([5], jnp.int32)
    slots = jnp.asarray([0], jnp.int32)
    try:
        dsv4.set_fp4_kernel("interpret")
        quant.set_fp8_kernel("interpret")
        _, lg_k = dsv4.decode(cfg, params, st, step, pos, slots)
    finally:
        dsv4.set_fp4_kernel(False)
        quant.set_fp8_kernel(False)
    _, lg_x = dsv4.decode(cfg, params, st, step, pos, slots)
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_x),
                               rtol=0, atol=5e-2)
    assert int(jnp.argmax(lg_k[0])) == int(jnp.argmax(lg_x[0]))


def test_moe_fp4_grouped_matches_oracle():
    """Grouped fp4 GEMM (interpret) == dequant oracle with skewed routing,
    empty experts, and tile-crossing segments."""
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

    rng = np.random.default_rng(11)
    E, OUT, IN, M, tm = 8, 64, 256, 64, 16
    q = jnp.asarray(rng.integers(0, 256, (E, OUT, IN // 2), dtype=np.uint8))
    s = jnp.asarray(np.exp2(rng.integers(-4, 3, (E, OUT, IN // 32))
                            ).astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, IN)).astype(np.float32))
    flat_e = np.sort(rng.choice([0, 1, 1, 1, 3, 7], M)).astype(np.int32)
    seg = pfp4.tile_segments(jnp.asarray(flat_e), tm, E)
    y = np.asarray(pfp4.moe_fp4_grouped(x, q, s, *seg, out_tile=32, tm=tm,
                                        interpret=True))
    wd = np.asarray(quant.dequant_any({"q": q, "s": s}, jnp.float32))
    ref = np.stack([np.asarray(x)[m] @ wd[flat_e[m]].T for m in range(M)])
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(y - ref).max() / scale < 2e-2


def test_dsv4_prefill_fp4_grouped_kernel_path():
    """Full DSv4 PREFILL with the fused grouped kernel (interpret) == the
    XLA dequant+ragged_dot path — the path that OOMs at flagship scale
    (12.9 GB/layer bf16 expert materialization, scripts/dsv4_flagship_probe
    round 4)."""
    from pegainfer_tpu.models import dsv4

    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=256, moe_inter_dim=256, n_layers=2,
        num_attention_heads=8, head_dim=32, q_lora_rank=32,
        qk_rope_head_dim=16, o_groups=8, o_lora_rank=8, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=32, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4), yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.quantize_params_resident(
        dsv4.init_random_params(cfg, seed=9, dtype=jnp.float32, scale=0.08)
    )
    toks = jnp.asarray([3, 17, 42, 9, 88, 12, 7, 55, 2, 91], jnp.int32)
    lg_x, _ = dsv4.prefill(cfg, params, toks,
                           modes=dsv4.RunModes())
    lg_k, _ = dsv4.prefill(cfg, params, toks,
                           modes=dsv4.RunModes(fp4_kernel="interpret"))
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_x),
                               rtol=0, atol=5e-2)
    assert (np.argmax(np.asarray(lg_k), -1)
            == np.argmax(np.asarray(lg_x), -1)).all()


@pytest.mark.parametrize(
    "E,OUT,IN",
    [
        (4, 64, 256),
        (4, 256, 512),     # multi-tile OUT
        (8, 64, 1024),     # wide IN
    ],
)
def test_int8_gemv_matches_oracle(E, OUT, IN):
    """int8 expert GEMV (unscaled kernel + caller-side scale) == dequant
    oracle — the speed-mode kernel (ops/quant.quantize_int8_stack)."""
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas.fp4_gemm import (
        int8_gemv_supported, moe_int8_gemv,
    )

    rng = np.random.default_rng(E + OUT + IN)
    w = rng.standard_normal((E, OUT, IN)).astype(np.float32) * 0.1
    cont = quant.quantize_int8_stack(w)
    assert int8_gemv_supported(cont["q"])
    M = 12
    x = rng.standard_normal((M, IN)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)

    y = moe_int8_gemv(jnp.asarray(x), cont["q"], idx, interpret=True)
    y = np.asarray(y) * np.asarray(cont["s"])[np.asarray(idx)]
    wb = quant.gather_dequant(cont, idx, jnp.bfloat16)
    y_ref = jax.lax.dot_general(
        jnp.asarray(x, jnp.bfloat16)[:, None, :], wb,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0]
    # kernel: int8->bf16 exact (integers <= 127), scale f32 after the dot;
    # oracle dequantizes to bf16 first — bf16 rounding of w*s bounds the gap
    np.testing.assert_allclose(y, np.asarray(y_ref), rtol=1e-2, atol=2e-2)


def test_moe_int8_grouped_matches_oracle():
    """Grouped int8 GEMM (interpret) == dequant oracle with skewed routing,
    empty experts, and tile-crossing segments."""
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

    rng = np.random.default_rng(13)
    E, OUT, IN, M, tm = 8, 64, 256, 64, 16
    w = rng.standard_normal((E, OUT, IN)).astype(np.float32) * 0.1
    cont = quant.quantize_int8_stack(w)
    x = jnp.asarray(rng.standard_normal((M, IN)).astype(np.float32))
    flat_e = np.sort(rng.choice([0, 1, 1, 1, 3, 7], M)).astype(np.int32)
    seg = pfp4.tile_segments(jnp.asarray(flat_e), tm, E)
    y = np.asarray(pfp4.moe_int8_grouped(x, cont["q"], *seg, out_tile=32,
                                         tm=tm, interpret=True))
    y = y * np.asarray(cont["s"])[flat_e]
    wd = np.asarray(quant.dequant_any(cont, jnp.float32))
    ref = np.stack([np.asarray(x)[m] @ wd[flat_e[m]].T for m in range(M)])
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(y - ref).max() / scale < 2e-2


def _int8_mode_cfg_params():
    from pegainfer_tpu.models import dsv4

    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=256, moe_inter_dim=256, n_layers=2,
        num_attention_heads=8, head_dim=32, q_lora_rank=32,
        qk_rope_head_dim=16, o_groups=8, o_lora_rank=8, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=32, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4), yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.quantize_params_resident(
        dsv4.init_random_params(cfg, seed=9, dtype=jnp.float32, scale=0.08),
        experts="int8",
    )
    return cfg, params


def test_dsv4_decode_int8_kernel_path():
    """Full DSv4 decode with int8-expert containers: fused kernel
    (interpret) == the XLA gather fallback on the SAME quantized weights."""
    from pegainfer_tpu.models import dsv4

    cfg, params = _int8_mode_cfg_params()
    toks = jnp.asarray([3, 17, 42, 9, 88], jnp.int32)
    state = dsv4.make_state(cfg, 1, 16)
    _, st = dsv4.prefill(cfg, params, toks, state=state, slot=jnp.int32(0),
                         modes=dsv4.RunModes())
    step = jnp.asarray([7], jnp.int32)
    pos = jnp.asarray([5], jnp.int32)
    slots = jnp.asarray([0], jnp.int32)
    _, lg_k = dsv4.decode(cfg, params, st, step, pos, slots,
                          modes=dsv4.RunModes(fp4_kernel="interpret"))
    _, lg_x = dsv4.decode(cfg, params, st, step, pos, slots,
                          modes=dsv4.RunModes())
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_x),
                               rtol=0, atol=2e-2)
    assert int(jnp.argmax(lg_k[0])) == int(jnp.argmax(lg_x[0]))


def test_dsv4_prefill_int8_grouped_kernel_path():
    """Full DSv4 PREFILL with int8-expert containers through the grouped
    kernel == the XLA dequant+ragged_dot path."""
    from pegainfer_tpu.models import dsv4

    cfg, params = _int8_mode_cfg_params()
    toks = jnp.asarray([3, 17, 42, 9, 88, 12, 7, 55, 2, 91], jnp.int32)
    lg_x, _ = dsv4.prefill(cfg, params, toks, modes=dsv4.RunModes())
    lg_k, _ = dsv4.prefill(cfg, params, toks,
                           modes=dsv4.RunModes(fp4_kernel="interpret"))
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_x),
                               rtol=0, atol=5e-2)
    assert (np.argmax(np.asarray(lg_k), -1)
            == np.argmax(np.asarray(lg_x), -1)).all()


def test_stacked_kernel_forms_match_sliced():
    """The stacked [L, ...] kernel forms (layer via prefetched scalar) ==
    the per-layer sliced forms, for all three fused kernels."""
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

    rng = np.random.default_rng(3)
    L, E, OUT, IN = 3, 4, 64, 256
    q4 = jnp.asarray(rng.integers(0, 256, (L, E, OUT, IN // 2), np.uint8))
    s4 = jnp.asarray(np.exp2(rng.integers(-4, 3, (L, E, OUT, IN // 32))
                             ).astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((5, IN)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, 5), jnp.int32)
    for li in (0, 2):
        a = pfp4.moe_fp4_gemv(x, q4[li], s4[li], idx, out_tile=32,
                              interpret=True)
        b = pfp4.moe_fp4_gemv(x, q4, s4, idx, out_tile=32, interpret=True,
                              layer=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)

    # grouped
    M, tm = 32, 8
    xs = jnp.asarray(rng.standard_normal((M, IN)).astype(np.float32))
    fe = jnp.sort(jnp.asarray(rng.integers(0, E, M), jnp.int32))
    seg = pfp4.tile_segments(fe, tm, E)
    for li in (1,):
        a = pfp4.moe_fp4_grouped(xs, q4[li], s4[li], *seg, out_tile=32,
                                 tm=tm, interpret=True)
        b = pfp4.moe_fp4_grouped(xs, q4, s4, *seg, out_tile=32, tm=tm,
                                 interpret=True, layer=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)

    # fp8 stacked
    w = rng.standard_normal((L, OUT, IN)).astype(np.float32) * 0.1
    conts = [quant.quantize_fp8_tensor(w[i]) for i in range(L)]
    q3 = jnp.stack([c["q"] for c in conts])
    s3 = jnp.stack([c["s"] for c in conts])
    from pegainfer_tpu.ops.pallas.fp4_gemm import fp8_gemv
    for li in (0, 2):
        a = fp8_gemv(x, q3[li], s3[li], interpret=True)
        b = fp8_gemv(x, q3, s3, interpret=True, layer=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)


def test_moe_int8_chain_matches_three_calls():
    """Fused w1+w3+swiglu+w2 chain kernel == the 3-GEMV + XLA-swiglu
    reference math, both stacked and unstacked (interpret mode)."""
    import numpy as np
    from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

    E, I, D, M, L = 4, 256, 512, 6, 2
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.integers(-127, 128, (L, E, I, D), dtype=np.int8))
    w3 = jnp.asarray(rng.integers(-127, 128, (L, E, I, D), dtype=np.int8))
    w2 = jnp.asarray(rng.integers(-127, 128, (L, E, D, I), dtype=np.int8))
    s1 = jnp.asarray(rng.uniform(0.001, 0.02, (L, E, I)).astype(np.float32))
    s3 = jnp.asarray(rng.uniform(0.001, 0.02, (L, E, I)).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0.001, 0.02, (L, E, D)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)
    LIMIT = 7.0

    def ref(li):
        xb = np.asarray(x.astype(jnp.bfloat16), np.float32)
        y = np.zeros((M, D), np.float32)
        for m in range(M):
            e = int(idx[m])
            g = (np.asarray(w1[li, e], np.float32) @ xb[m]) * np.asarray(s1[li, e])
            u = (np.asarray(w3[li, e], np.float32) @ xb[m]) * np.asarray(s3[li, e])
            g = np.minimum(g, LIMIT)
            u = np.clip(u, -LIMIT, LIMIT)
            act = np.asarray(jnp.asarray(
                (1 / (1 + np.exp(-g))) * g * u, jnp.bfloat16), np.float32)
            y[m] = (np.asarray(w2[li, e], np.float32) @ act) * np.asarray(s2[li, e])
        return y

    assert pfp4.int8_chain_supported({"q": w1}, {"q": w2}, M)
    for li in range(L):
        out = pfp4.moe_int8_chain(
            x, w1, w3, w2, s1, s3, s2, idx, limit=LIMIT, interpret=True,
            layer=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(out), ref(li),
                                   rtol=2e-2, atol=2e-2)
    # unstacked form
    out = pfp4.moe_int8_chain(
        x, w1[0], w3[0], w2[0], s1[0], s3[0], s2[0], idx, limit=LIMIT,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref(0), rtol=2e-2, atol=2e-2)


def test_moe_fp4_chain_matches_three_calls():
    """Fused packed-fp4 chain (SWAR decode + in-kernel activation parity
    split) == the 3-GEMV + XLA-swiglu path, stacked + unstacked."""
    import numpy as np
    from pegainfer_tpu.ops import quant
    from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

    E, I, D, M, L = 4, 256, 512, 6, 2
    rng = np.random.default_rng(2)

    def stack(out_d, in_d):
        w = rng.standard_normal((L, E, out_d, in_d)).astype(np.float32) * 0.1
        per = [quant.quantize_fp4_stack(jnp.asarray(w[li])) for li in range(L)]
        return {"q": jnp.stack([p_["q"] for p_ in per]),
                "s": jnp.stack([p_["s"] for p_ in per])}

    w1 = stack(I, D)
    w3 = stack(I, D)
    w2 = stack(D, I)
    x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)
    LIMIT = 7.0

    def ref(li):
        def gemv(xrows, w):
            return pfp4.moe_fp4_gemv(
                xrows, w["q"][li], w["s"][li], idx, interpret=True)
        ge = gemv(x, w1)
        ue = gemv(x, w3)
        g = jnp.minimum(ge, LIMIT)
        u = jnp.clip(ue, -LIMIT, LIMIT)
        act = jax.nn.sigmoid(g) * g * u
        return np.asarray(gemv(act, w2))

    assert pfp4.fp4_chain_supported(
        {"q": w1["q"], "s": w1["s"]}, {"q": w2["q"], "s": w2["s"]}, M)
    for li in range(L):
        out = pfp4.moe_fp4_chain(
            x, w1["q"], w1["s"], w3["q"], w3["s"], w2["q"], w2["s"], idx,
            limit=LIMIT, interpret=True, layer=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(out), ref(li),
                                   rtol=2e-2, atol=2e-2)
    out = pfp4.moe_fp4_chain(
        x, w1["q"][0], w1["s"][0], w3["q"][0], w3["s"][0], w2["q"][0],
        w2["s"][0], idx, limit=LIMIT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref(0), rtol=2e-2, atol=2e-2)
