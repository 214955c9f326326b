"""DeepSeek-V2-Lite family: HF-oracle parity, absorbed-MLA decode, EP=2
sharded equality, and the on-disk --model-path product path.

Reference: pegainfer-deepseek-v2-lite/ — the minimal expert-parallel
reference engine (greedy, EP=2, 64 routed experts split 32/32,
src/ep.rs:10-101); its accuracy gate is greedy-token agreement."""

import json

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions,
    Finished,
    GenerateRequest,
    SamplingParams,
    Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import dsv2lite as v2l


def hf_tiny():
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_shared_experts=2, n_routed_experts=8, num_experts_per_tok=2,
        routed_scaling_factor=1.0, norm_topk_prob=False,
        scoring_func="softmax", topk_method="greedy", n_group=1,
        topk_group=1, first_k_dense_replace=1, moe_layer_freq=1,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, rms_norm_eps=1e-6,
        rope_theta=10000.0, max_position_embeddings=512,
        tie_word_embeddings=False, eos_token_id=1, bos_token_id=0,
        attn_implementation="eager", attention_bias=False,
    )
    torch.manual_seed(0)
    model = DeepseekV2ForCausalLM(cfg).eval()
    return cfg, model


def jx_cfg_from_hf(hf):
    return v2l.DSv2LiteConfig(
        vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
        intermediate_size=hf.intermediate_size,
        moe_intermediate_size=hf.moe_intermediate_size,
        num_hidden_layers=hf.num_hidden_layers,
        first_k_dense_replace=hf.first_k_dense_replace,
        num_attention_heads=hf.num_attention_heads,
        kv_lora_rank=hf.kv_lora_rank,
        qk_nope_head_dim=hf.qk_nope_head_dim,
        qk_rope_head_dim=hf.qk_rope_head_dim,
        v_head_dim=hf.v_head_dim,
        n_routed_experts=hf.n_routed_experts,
        n_shared_experts=hf.n_shared_experts,
        num_experts_per_token=hf.num_experts_per_tok,
        routed_scaling_factor=hf.routed_scaling_factor,
        norm_topk_prob=hf.norm_topk_prob,
        rms_norm_eps=hf.rms_norm_eps, rope_theta=hf.rope_theta,
        max_position_embeddings=hf.max_position_embeddings,
        eos_token_id=1, bos_token_id=0,
    )


@pytest.fixture(scope="module")
def tiny():
    hf, model = hf_tiny()
    cfg = jx_cfg_from_hf(hf)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = v2l.params_from_state_dict(cfg, sd, dtype=jnp.float32)
    return hf, model, cfg, params


def test_prefill_logits_match_hf(tiny):
    hf, model, cfg, params = tiny
    rng = np.random.default_rng(3)
    toks = rng.integers(2, 128, 12)
    with torch.no_grad():
        want = model(torch.tensor(toks[None])).logits[0].float().numpy()
    state = v2l.make_state(cfg, 1, 32)
    _, last, all_lg = v2l.prefill(
        cfg, params, state, jnp.asarray(toks, jnp.int32), jnp.int32(12),
        jnp.int32(0), return_all_logits=True)
    np.testing.assert_allclose(np.asarray(all_lg), want, rtol=0, atol=2e-3)
    assert (np.argmax(np.asarray(all_lg), -1) == np.argmax(want, -1)).all()


def test_greedy_tokens_match_hf(tiny):
    """Engine greedy generation (absorbed-MLA latent-cache decode) ==
    HF generate (materialized per-head K/V)."""
    hf, model, cfg, params = tiny
    rng = np.random.default_rng(5)
    prompt = rng.integers(2, 128, 9).tolist()
    with torch.no_grad():
        out = model.generate(
            torch.tensor(prompt)[None], max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)
    want = out[0, len(prompt):].tolist()

    runtime = v2l.make_runtime(cfg, params, max_model_len=64, max_slots=2)
    handle = start_scheduler(JaxExecutor(
        runtime, EngineLoadOptions(precompile=False, max_batch_size=2)))
    try:
        req = GenerateRequest(prompt_tokens=prompt, max_tokens=8,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        got = [ev.id for ev in req.channel if isinstance(ev, Token)]
    finally:
        handle.shutdown()
    assert got == want


def test_ep2_tokens_match_single_device(tiny):
    """Experts sharded over an ep=2 mesh (ops.moe_ep AG/RS — the
    reference's 32/32 split as a mesh axis) produce the single-device
    tokens through the engine."""
    hf, model, cfg, params = tiny
    rng = np.random.default_rng(7)
    prompt = rng.integers(2, 128, 7).tolist()

    def run(mesh):
        runtime = v2l.make_runtime(cfg, params, max_model_len=64,
                                   max_slots=2, mesh=mesh)
        handle = start_scheduler(JaxExecutor(
            runtime, EngineLoadOptions(precompile=False, max_batch_size=2)))
        try:
            req = GenerateRequest(prompt_tokens=prompt, max_tokens=6,
                                  params=SamplingParams(ignore_eos=True))
            handle.submit(req)
            return [ev.id for ev in req.channel if isinstance(ev, Token)]
        finally:
            handle.shutdown()

    want = run(None)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("ep",))
    got = run(mesh)
    assert got == want


def test_model_path_end_to_end(tmp_path, tiny):
    """config.json + safetensors on disk → probe/detect → start_engine →
    greedy tokens == the in-memory engine (the DSv4 write_fake_checkpoint
    pattern applied to the Lite family)."""
    from safetensors import numpy as st_numpy

    from pegainfer_tpu.server.main import detect_model_type

    hf, model, cfg, params = tiny
    cfg_dict = hf.to_dict()
    cfg_dict["architectures"] = ["DeepseekV2ForCausalLM"]
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    st_numpy.save_file(sd, str(tmp_path / "model.safetensors"))

    assert v2l.probe_model(str(tmp_path))
    assert detect_model_type(str(tmp_path)) == "dsv2lite"

    rng = np.random.default_rng(9)
    prompt = rng.integers(2, 128, 6).tolist()
    handle = v2l.start_engine(
        str(tmp_path),
        EngineLoadOptions(precompile=False, max_batch_size=2,
                          max_model_len=64),
        ep_size=1,
    )
    try:
        req = GenerateRequest(prompt_tokens=prompt, max_tokens=5,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        disk = [ev.id for ev in req.channel if isinstance(ev, Token)]
    finally:
        handle.shutdown()

    # bf16 disk engine vs f32 fixture differ in dtype; compare against a
    # bf16 in-memory engine for exactness
    params_bf16 = v2l.params_from_state_dict(cfg, sd)
    runtime = v2l.make_runtime(cfg, params_bf16, max_model_len=64,
                               max_slots=2)
    mem = start_scheduler(JaxExecutor(
        runtime, EngineLoadOptions(precompile=False, max_batch_size=2)))
    try:
        req = GenerateRequest(prompt_tokens=prompt, max_tokens=5,
                              params=SamplingParams(ignore_eos=True))
        mem.submit(req)
        want = [ev.id for ev in req.channel if isinstance(ev, Token)]
    finally:
        mem.shutdown()
    assert disk == want


def test_ep2_prefill_scale_tokens_match(tiny):
    """A prompt long enough for the prefill-scale EP path (T >= 8 routes
    through moe_ep_a2a_chunked token shipping, not the decode-sized
    gather) produces the single-device tokens."""
    hf, model, cfg, params = tiny
    rng = np.random.default_rng(11)
    prompt = rng.integers(2, 128, 16).tolist()

    def run(mesh):
        runtime = v2l.make_runtime(cfg, params, max_model_len=64,
                                   max_slots=2, mesh=mesh)
        handle = start_scheduler(JaxExecutor(
            runtime, EngineLoadOptions(precompile=False, max_batch_size=2)))
        try:
            req = GenerateRequest(prompt_tokens=prompt, max_tokens=6,
                                  params=SamplingParams(ignore_eos=True))
            handle.submit(req)
            return [ev.id for ev in req.channel if isinstance(ev, Token)]
        finally:
            handle.shutdown()

    want = run(None)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("ep",))
    got = run(mesh)
    assert got == want


def test_non_pow2_max_model_len(tiny):
    """The executor pads prompts to pow2 buckets, which can exceed a
    non-pow2 max_model_len; the prefill cache write must clamp instead of
    crashing (round-5 review finding)."""
    hf, model, cfg, params = tiny
    rng = np.random.default_rng(13)
    prompt = rng.integers(2, 128, 40).tolist()  # pads to 64 > 50

    runtime = v2l.make_runtime(cfg, params, max_model_len=50, max_slots=2)
    handle = start_scheduler(JaxExecutor(
        runtime, EngineLoadOptions(precompile=False, max_batch_size=2)))
    try:
        req = GenerateRequest(prompt_tokens=prompt, max_tokens=5,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        toks = [ev.id for ev in req.channel if isinstance(ev, Token)]
        assert len(toks) == 5
    finally:
        handle.shutdown()
