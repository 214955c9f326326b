"""On-disk checkpoint dress rehearsal for the Qwen families (VERDICT r4
missing #4): write a tiny HF-format checkpoint (config.json +
model.safetensors + generation_config.json) and drive the REAL
``--model-path`` product path — detect_model_type →
qwen3_engine/qwen35_engine.start_engine(path) → generate — so loader
bit-rot surfaces in CI, not on the day a real checkpoint appears.
Reference analog: pegainfer-server/src/server_engine.rs:33-76 and the
DSv4 write_fake_checkpoint chain (tests/test_dsv4_engine.py)."""

import json

import numpy as np
import pytest
import torch
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
from pegainfer_tpu.server.main import detect_model_type


def _gen(handle, prompt, n):
    req = GenerateRequest(prompt_tokens=prompt, max_tokens=n,
                          params=SamplingParams(ignore_eos=True))
    handle.submit(req)
    toks = []
    for ev in req.channel:
        if isinstance(ev, Token):
            toks.append(ev.id)
        elif isinstance(ev, Finished):
            break
    return toks


def _write_checkpoint(tmpdir, hf_cfg, model):
    from safetensors import numpy as st_numpy

    cfg_dict = hf_cfg.to_dict()
    cfg_dict["architectures"] = [type(model).__name__]
    with open(tmpdir / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    with open(tmpdir / "generation_config.json", "w") as f:
        json.dump({"eos_token_id": hf_cfg.eos_token_id}, f)
    # tokenizer stub (the engine path doesn't read it; the server does)
    with open(tmpdir / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast"}, f)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    st_numpy.save_file(sd, str(tmpdir / "model.safetensors"))
    return sd


def test_qwen3_model_path_end_to_end(tmp_path):
    from transformers import Qwen3Config as HFQwen3Config
    from transformers import Qwen3ForCausalLM

    from pegainfer_tpu.models import qwen3 as q3
    from pegainfer_tpu.models import qwen3_engine

    hf = HFQwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, max_position_embeddings=512,
        eos_token_id=0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf).eval()
    sd = _write_checkpoint(tmp_path, hf, model)

    assert detect_model_type(str(tmp_path)) == "qwen3"
    assert qwen3_engine.probe_model(str(tmp_path))

    rng = np.random.default_rng(3)
    prompt = rng.integers(2, 256, 12).tolist()

    # the product path: config + safetensors read from disk
    handle = qwen3_engine.start_engine(
        str(tmp_path),
        EngineLoadOptions(precompile=False, max_num_pages=64),
    )
    try:
        disk_toks = _gen(handle, prompt, 8)
    finally:
        handle.shutdown()

    # oracle: the same state dict fed in memory (the parity-test path)
    cfg = q3.Qwen3Config.from_model_path(str(tmp_path))
    assert cfg.num_hidden_layers == 2 and cfg.head_dim == 16
    params = q3.params_from_state_dict(cfg, sd)
    runtime = q3.make_runtime(cfg, params, num_pages=64,
                              page_size=qwen3_engine.DEFAULT_PAGE_SIZE)
    mem = start_scheduler(JaxExecutor(runtime, EngineLoadOptions()))
    try:
        mem_toks = _gen(mem, prompt, 8)
    finally:
        mem.shutdown()

    assert len(disk_toks) == 8
    assert disk_toks == mem_toks


def test_qwen35_model_path_end_to_end(tmp_path):
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    from pegainfer_tpu.models import qwen35 as q35
    from pegainfer_tpu.models import qwen35_engine

    hf = Qwen3NextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25, tie_word_embeddings=True,
        max_position_embeddings=512,
        layer_types=["linear_attention", "full_attention"],
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=0, eos_token_id=0,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = Qwen3NextForCausalLM(hf).eval()
    sd = _write_checkpoint(tmp_path, hf, model)

    assert detect_model_type(str(tmp_path)) == "qwen35"
    assert qwen35_engine.probe_model(str(tmp_path))

    rng = np.random.default_rng(5)
    prompt = rng.integers(2, 256, 12).tolist()

    handle = qwen35_engine.start_engine(
        str(tmp_path),
        EngineLoadOptions(precompile=False, max_num_pages=64),
    )
    try:
        disk_toks = _gen(handle, prompt, 8)
    finally:
        handle.shutdown()

    cfg = q35.Qwen35Config.from_model_path(str(tmp_path))
    assert cfg.num_hidden_layers == 2
    params = q35.params_from_state_dict(cfg, sd)
    runtime = q35.make_runtime(
        cfg, params, num_pages=64,
        page_size=qwen35_engine.DEFAULT_PAGE_SIZE,
        flat_decode=True)
    mem = start_scheduler(JaxExecutor(runtime, EngineLoadOptions()))
    try:
        mem_toks = _gen(mem, prompt, 8)
    finally:
        mem.shutdown()

    assert len(disk_toks) == 8
    assert disk_toks == mem_toks
