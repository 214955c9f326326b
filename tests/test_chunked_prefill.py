"""Chunked prefill == whole-prompt prefill (token-exact through the engine)."""

import numpy as np
import pytest

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
from pegainfer_tpu.models import qwen3 as q3


def make_engine(prefill_chunk):
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=1024,
    )
    params = q3.init_random_params(cfg, seed=3, dtype=jnp.float32)
    runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                              kv_dtype=jnp.float32)
    ex = JaxExecutor(runtime, EngineLoadOptions(prefill_chunk=prefill_chunk))
    return start_scheduler(ex)


def gen(handle, prompt, n):
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


@pytest.mark.parametrize("plen", [37, 64, 100])
def test_chunked_matches_whole(plen):
    rng = np.random.default_rng(plen)
    prompt = rng.integers(2, 128, plen).tolist()

    whole = make_engine(prefill_chunk=4096)
    chunked = make_engine(prefill_chunk=16)  # forces 16-token chunks
    try:
        a = gen(whole, prompt, 8)
        b = gen(chunked, prompt, 8)
        assert a == b
        assert len(a) == 8
    finally:
        whole.shutdown()
        chunked.shutdown()
