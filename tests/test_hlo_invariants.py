"""Program-structure invariants on the lowered hot paths.

The round-1 "KV-pool copy saga" (docs/PERF.md): a fancy-index scatter on
the multi-GB KV pool lowers to an HLO scatter, which XLA:TPU materializes
as a full pool copy per step even on donated buffers. Every pool write
must be a dynamic_update_slice chain instead. These tests pin that at the
StableHLO level (backend-agnostic): the decode/prefill programs must
contain NO scatter ops touching state.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pegainfer_tpu.models import qwen3 as q3


def _stablehlo(fn, *args):
    return jax.jit(fn).lower(*args).as_text()


def test_qwen3_decode_wa_has_no_scatter():
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=0, dtype=jnp.float32)
    kv = q3.make_kv_pages(cfg, 16, 4, dtype=jnp.float32)
    B = 2
    pend = q3.make_pend(cfg, B, jnp.float32)
    toks = jnp.zeros((B,), jnp.int32)
    pos = jnp.asarray([5, 3], jnp.int32)
    tables = jnp.ones((B, 4), jnp.int32)
    sl = pos + 1

    txt = _stablehlo(
        lambda p, kv_, pend_, t, po, tb, s: q3.decode_wa(
            cfg, p, kv_, pend_, t, po, tb, s),
        params, kv, pend, toks, pos, tables, sl,
    )
    assert "scatter" not in txt, "decode_wa lowered with a scatter op"


def test_qwen3_prefill_and_chunk_have_no_scatter():
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=0, dtype=jnp.float32)
    kv = q3.make_kv_pages(cfg, 16, 4, dtype=jnp.float32)
    toks = jnp.zeros((8,), jnp.int32)
    table = jnp.ones((2,), jnp.int32)
    txt = _stablehlo(
        lambda p, kv_, t, sl, tb: q3.prefill(cfg, p, kv_, t, sl, tb),
        params, kv, toks, jnp.int32(8), table,
    )
    assert "scatter" not in txt

    cpend = q3.make_chunk_pend(cfg, 2, 4, jnp.float32)
    table_full = jnp.ones((4,), jnp.int32)
    txt = _stablehlo(
        lambda p, kv_, cp, t, sp, va, tb: q3.prefill_chunk_wa(
            cfg, p, kv_, cp, t, sp, va, tb),
        params, kv, cpend, toks, jnp.int32(0), jnp.int32(8), table_full,
    )
    assert "scatter" not in txt


def test_qwen35_decode_wa_has_no_scatter():
    from pegainfer_tpu.models import qwen35 as q35

    cfg = q35.Qwen35Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        vocab_size=256, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25,
        layer_types=("linear_attention", "full_attention"),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, tie_word_embeddings=True,
        eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q35.init_bench_params(cfg, dtype=jnp.float32)
    state = q35.make_state(cfg, 8, 4, max_slots=4, kv_dtype=jnp.float32)
    B = 2
    pend = q35.make_pend(cfg, B, 4, jnp.float32)
    toks = jnp.zeros((B,), jnp.int32)
    pos = jnp.asarray([5, 3], jnp.int32)
    tables = jnp.ones((B, 4), jnp.int32)
    slots = jnp.asarray([0, 1], jnp.int32)

    txt = _stablehlo(
        lambda p, s, pd, t, po, tb, sl, st: q35.decode_wa(
            cfg, p, s, pd, t, po, tb, sl, st),
        params, state, pend, toks, pos, tables, pos + 1, slots,
    )
    assert "scatter" not in txt
