"""Int8 weight-only serving mode: close logits, working engine path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen3 as q3


@pytest.fixture(scope="module")
def cfg_params():
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=5, dtype=jnp.float32)
    return cfg, params


def test_int8_logits_close(cfg_params):
    cfg, params = cfg_params
    q8 = q3.quantize_params_int8(params)
    from pegainfer_tpu.engine.kv import PagePool, KvState

    kv = q3.make_kv_pages(cfg, 32, 4, dtype=jnp.float32)
    kv8 = q3.make_kv_pages(cfg, 32, 4, dtype=jnp.float32)
    toks = jnp.asarray(np.arange(8) + 3, jnp.int32)
    table = jnp.asarray([1, 2], jnp.int32)
    _, l1, _ = q3.prefill(cfg, params, kv, toks, jnp.int32(8), table)
    _, l2, _ = q3.prefill(cfg, q8, kv8, toks, jnp.int32(8), table)
    a, b = np.asarray(l1), np.asarray(l2)
    # cosine similarity of the logit vectors stays high under int8
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_int8_engine_generates(cfg_params):
    cfg, params = cfg_params
    q8 = q3.quantize_params_int8(params)
    runtime = q3.make_runtime(cfg, q8, num_pages=64, page_size=4,
                              kv_dtype=jnp.float32)
    handle = start_scheduler(JaxExecutor(runtime, EngineLoadOptions()))
    try:
        req = GenerateRequest(prompt_tokens=[3, 9, 27], max_tokens=10,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        toks = [ev.id for ev in req.channel if isinstance(ev, Token)]
        assert len(toks) == 10

        req2 = GenerateRequest(prompt_tokens=[3, 9, 27], max_tokens=10,
                               params=SamplingParams(ignore_eos=True))
        handle.submit(req2)
        toks2 = [ev.id for ev in req2.channel if isinstance(ev, Token)]
        assert toks2 == toks  # deterministic
    finally:
        handle.shutdown()


# ── Qwen3.5 hybrid int8 ──────────────────────────────────────────────────


@pytest.fixture(scope="module")
def q35_cfg_params():
    from pegainfer_tpu.models import qwen35 as q35

    cfg = q35.Qwen35Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25,
        layer_types=("linear_attention",) * 3 + ("full_attention",),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, tie_word_embeddings=True,
        eos_token_id=1, stop_token_ids=(1,), max_position_embeddings=512,
    )
    params = q35.init_bench_params(cfg, dtype=jnp.float32, fill=0.02)
    # perturb so logits aren't degenerate-uniform
    rng = np.random.default_rng(3)
    params["embed"] = jnp.asarray(
        rng.standard_normal(params["embed"].shape) * 0.05, jnp.float32)
    params["lm_head"] = jnp.asarray(
        rng.standard_normal(params["lm_head"].shape) * 0.05, jnp.float32)
    return cfg, params


def test_q35_int8_logits_close(q35_cfg_params):
    from pegainfer_tpu.models import qwen35 as q35

    cfg, params = q35_cfg_params
    q8 = q35.quantize_params_int8(jax.tree.map(lambda a: a, params))
    state = q35.make_state(cfg, 32, 4, max_slots=2, kv_dtype=jnp.float32)
    state8 = q35.make_state(cfg, 32, 4, max_slots=2, kv_dtype=jnp.float32)
    toks = jnp.asarray(np.arange(8) + 3, jnp.int32)
    table = jnp.asarray([1, 2], jnp.int32)
    _, l1, _ = q35.prefill(cfg, params, state, toks, jnp.int32(8), table,
                           jnp.int32(0))
    _, l2, _ = q35.prefill(cfg, q8, state8, toks, jnp.int32(8), table,
                           jnp.int32(0))
    a, b = np.asarray(l1), np.asarray(l2)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_q35_int8_engine_generates(q35_cfg_params):
    from pegainfer_tpu.models import qwen35 as q35

    cfg, params = q35_cfg_params
    q8 = q35.quantize_params_int8(jax.tree.map(lambda a: a, params))
    runtime = q35.make_runtime(cfg, q8, num_pages=64, page_size=4,
                               max_slots=4, kv_dtype=jnp.float32)
    handle = start_scheduler(JaxExecutor(runtime, EngineLoadOptions(
        max_batch_size=4)))
    try:
        req = GenerateRequest(prompt_tokens=[3, 9, 27], max_tokens=10,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        toks = [ev.id for ev in req.channel if isinstance(ev, Token)]
        assert len(toks) == 10
    finally:
        handle.shutdown()


def test_int8_tp_sharding(cfg_params):
    """int8 {q8, s} leaves shard under the TP specs (scale drops the input
    axis) and produce the same logits as unsharded int8."""
    from pegainfer_tpu.parallel.sharding import MeshConfig, make_mesh, shard_qwen3

    cfg, params = cfg_params
    q8 = q3.quantize_params_int8(jax.tree.map(lambda a: a, params))
    kv = q3.make_kv_pages(cfg, 32, 4, dtype=jnp.float32)
    toks = jnp.asarray(np.arange(8) + 3, jnp.int32)
    table = jnp.asarray([1, 2], jnp.int32)
    _, ref, _ = q3.prefill(cfg, q8, kv, toks, jnp.int32(8), table)

    mesh = make_mesh(MeshConfig(dp=1, tp=2))
    kv2 = q3.make_kv_pages(cfg, 32, 4, dtype=jnp.float32)
    q8s, kv2 = shard_qwen3(mesh, cfg, q8, kv2)
    _, out, _ = q3.prefill(cfg, q8s, kv2, toks, jnp.int32(8), table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_init_bench_params_int8_matches_quantize(cfg_params):
    """init_bench_params_int8 (direct int8 container, no bf16 tree — the
    Qwen3-8B single-chip path, bench/serving.py --random-qwen3-8b) equals
    quantize_params_int8(init_bench_params(cfg)) leaf-for-leaf."""
    cfg, _ = cfg_params
    direct = q3.init_bench_params_int8(cfg)
    staged = q3.quantize_params_int8(q3.init_bench_params(cfg))

    flat_d = jax.tree_util.tree_leaves_with_path(direct)
    flat_s = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(staged)}
    assert {jax.tree_util.keystr(k) for k, _ in flat_d} == set(flat_s)
    for k, v in flat_d:
        ref = flat_s[jax.tree_util.keystr(k)]
        assert v.dtype == ref.dtype, k
        np.testing.assert_allclose(np.asarray(v, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=1e-6, atol=0)
