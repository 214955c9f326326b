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


# ── MP8 decode collective audit (VERDICT r4 next #3) ────────────────────
#
# The reference's measured decode pathology class is COLLECTIVE COUNT: its
# MP8 DSv4 decode issued ~107 f32 collectives per token
# (/root/reference/docs/models/deepseek-v4/moe-tilelang-review.md; SURVEY
# §3.5). Here the whole step is one jitted program, so GSPMD decides the
# collective schedule — this audit compiles the sharded decode on the
# virtual world-8 mesh and asserts a hard per-token budget on the
# post-partitioning HLO, so a sharding-spec regression that floods the
# step with per-layer gathers fails CI instead of surfacing as a 2x TPOT
# on real multi-chip hardware.

import re

_COLLECTIVE_DEF = re.compile(
    r"%?\S+ = ([a-z0-9]+)\[([0-9,]*)\]\S* "
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\("
)

_ITEMSIZE = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
             "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def _collective_defs(compiled_text):
    defs = _COLLECTIVE_DEF.findall(compiled_text)
    out = []
    for dtype, shape, kind in defs:
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        out.append((kind, dtype, n * _ITEMSIZE.get(dtype, 4)))
    return out


def _dsv4_mp8_decode_hlo(n_layers):
    from pegainfer_tpu.models import dsv4
    from pegainfer_tpu.parallel.sharding import MeshConfig, make_mesh, shard_dsv4

    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=32, moe_inter_dim=16, n_layers=n_layers,
        num_attention_heads=8, head_dim=16, q_lora_rank=16,
        qk_rope_head_dim=8, o_groups=8, o_lora_rank=4, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=0, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=16, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0,) + (4,) * (n_layers - 1),
        yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.init_random_params(cfg, seed=3, dtype=jnp.float32,
                                     scale=0.08)
    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    state = dsv4.make_state(cfg, max_slots=1, max_blocks=8)
    params8, state8 = shard_dsv4(mesh, params, state)
    fn = jax.jit(lambda p, s, t, pos, slots: dsv4.decode(
        cfg, p, s, t, pos, slots))
    txt = fn.lower(params8, state8, jnp.zeros((1,), jnp.int32),
                   jnp.asarray([8], jnp.int32),
                   jnp.asarray([0], jnp.int32)).compile().as_text()
    # no hidden trip counts: every collective def in the text runs exactly
    # once per token (a while-wrapped layer scan would undercount)
    assert not re.search(r"= \S+ while\(", txt), \
        "decode compiled with a while loop — static collective count invalid"
    return txt


def test_dsv4_mp8_decode_collective_budget():
    """Per-token collective budget for the sharded DSv4 decode step.

    Measured on this tree (virtual world-8 mesh, XLA:CPU GSPMD): 4
    all-reduces at L=2 and +1 per additional layer — vs the reference's
    ~107/token at 43 layers. Budget leaves headroom (XLA scheduling may
    legitimately split a reduce) without admitting the pathology class:
    <= 3 per layer + 8 fixed (head/embed/sampling)."""
    defs2 = _collective_defs(_dsv4_mp8_decode_hlo(2))
    defs3 = _collective_defs(_dsv4_mp8_decode_hlo(3))
    per_layer = len(defs3) - len(defs2)
    assert per_layer <= 3, (per_layer, defs3)
    assert len(defs2) <= 8 + 3 * 2, defs2
    assert len(defs3) <= 8 + 3 * 3, defs3
    # bytes per token stay hidden-sized (no logits-sized f32 transport:
    # the reference's 63 ms logits D2H class — SURVEY §3.5)
    for kind, dtype, nbytes in defs2 + defs3:
        assert nbytes <= 16 * 32 * 4, (kind, dtype, nbytes)
