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


def test_interleaved_unified_streams_stay_correct():
    """A long prompt arriving while another request decodes must interleave
    (chunk/decode time-slicing) and both outputs must equal solo runs."""
    rng = np.random.default_rng(42)
    short = rng.integers(2, 128, 6).tolist()
    long_p = rng.integers(2, 128, 80).tolist()

    solo = make_engine(prefill_chunk=16)
    try:
        want_short = gen(solo, short, 24)
        want_long = gen(solo, long_p, 8)
    finally:
        solo.shutdown()

    handle = make_engine(prefill_chunk=16)
    try:
        from pegainfer_tpu.engine.contract import GenerateRequest, SamplingParams
        import threading, time as _t

        r1 = GenerateRequest(prompt_tokens=short, max_tokens=24,
                             params=SamplingParams(ignore_eos=True))
        handle.submit(r1)
        _t.sleep(0.3)  # let r1 reach steady decode
        r2 = GenerateRequest(prompt_tokens=long_p, max_tokens=8,
                             params=SamplingParams(ignore_eos=True))
        handle.submit(r2)

        out1 = [ev.id for ev in r1.channel if isinstance(ev, Token)]
        out2 = [ev.id for ev in r2.channel if isinstance(ev, Token)]
        assert out1 == want_short
        assert out2 == want_long
    finally:
        handle.shutdown()


def test_qwen35_chunked_matches_whole():
    """Hybrid-model chunked prefill (GDN/conv state continuation) must be
    token-exact vs whole-prompt prefill."""
    import torch
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    from pegainfer_tpu.models import qwen35 as q35

    hf = Qwen3NextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25, tie_word_embeddings=True,
        max_position_embeddings=512,
        layer_types=["linear_attention", "full_attention"],
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=0, attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = Qwen3NextForCausalLM(hf).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = q35.Qwen35Config.from_hf(hf)
    params = q35.params_from_state_dict(cfg, sd, dtype=jnp.float32)

    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler

    def make(chunk):
        runtime = q35.make_runtime(cfg, params, num_pages=128, page_size=4,
                                   max_slots=4, kv_dtype=jnp.float32,
                                   use_pallas=False)
        return start_scheduler(JaxExecutor(
            runtime, EngineLoadOptions(prefill_chunk=chunk)))

    rng = np.random.default_rng(11)
    prompt = rng.integers(2, 255, 45).tolist()
    whole = make(4096)
    chunked = make(16)
    try:
        a = gen(whole, prompt, 8)
        b = gen(chunked, prompt, 8)
        assert len(a) == 8
        assert a == b
    finally:
        whole.shutdown()
        chunked.shutdown()


def test_adaptive_chunking_under_decode_load():
    """With decode_active set, the stepper plans smaller (mixed) chunks —
    more yields, same final tokens (adaptive chunking, contract.py
    prefill_chunk_mixed)."""
    from pegainfer_tpu.engine.executor import PrefillStepItem

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=1024,
    )
    params = q3.init_random_params(cfg, seed=3, dtype=jnp.float32)
    rng = np.random.default_rng(8)
    prompt = rng.integers(2, 127, 64).tolist()

    def run(decode_active):
        runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                                  kv_dtype=jnp.float32)
        ex = JaxExecutor(runtime, EngineLoadOptions(
            prefill_chunk=32, prefill_chunk_mixed=16,
            enable_prefix_cache=False))
        ex.decode_active = decode_active
        item = PrefillStepItem(request_id=1, prompt_tokens=list(prompt),
                               params=SamplingParams(ignore_eos=True))
        gen_ = ex.prefill_stepper(item)
        yields = 0
        while True:
            try:
                next(gen_)
                yields += 1
            except StopIteration as s:
                return yields, s.value.first_token

    y_solo, tok_solo = run(False)
    y_mixed, tok_mixed = run(True)
    assert y_solo == 1      # 32+32: 2 pieces, 1 interior yield
    # mixed: 16+16, then the 32-wide tail bucket (small == chunk at this
    # tiny scale) -> 3 pieces, 2 interior yields
    assert y_mixed == 2
    assert tok_solo == tok_mixed


def test_echo_logprobs_chunked_matches_whole():
    """echo+logprobs rides the chunked path (prefill_chunk_wa_all_fn):
    per-prompt-token logprobs from chunked prefill equal the whole-prompt
    all-logits path."""
    from pegainfer_tpu.engine.executor import PrefillPlan, PrefillStepItem

    from pegainfer_tpu.engine.jax_executor import JaxExecutor as JE

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=1024,
    )
    params = q3.init_random_params(cfg, seed=3, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    prompt = rng.integers(2, 127, 53).tolist()

    def echo_prefill(chunk):
        runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                                  kv_dtype=jnp.float32)
        ex = JE(runtime, EngineLoadOptions(prefill_chunk=chunk,
                                           enable_prefix_cache=False))
        item = PrefillStepItem(request_id=1, prompt_tokens=list(prompt),
                               params=SamplingParams(ignore_eos=True),
                               logprobs=2, echo=True)
        res = ex.execute_prefill(PrefillPlan(requests=[item], echo=True))
        return res.requests[0]

    whole = echo_prefill(chunk=4096)
    chunked = echo_prefill(chunk=16)  # forces 16-token chunks
    assert whole.prompt_logprobs is not None
    assert chunked.prompt_logprobs is not None
    assert whole.prompt_logprobs[0] is None and chunked.prompt_logprobs[0] is None
    assert len(chunked.prompt_logprobs) == len(whole.prompt_logprobs) == len(prompt)
    got = [t.logprob for t in chunked.prompt_logprobs[1:]]
    ref = [t.logprob for t in whole.prompt_logprobs[1:]]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    assert chunked.first_token == whole.first_token
    assert chunked.first_token_logprob.logprob == pytest.approx(
        whole.first_token_logprob.logprob, rel=1e-4)


def test_adaptive_piece_plan_fuzz():
    """Randomized decode_active flips BETWEEN chunks + random prompt
    lengths: every schedule must cover [start0, T) with page-aligned
    interior ends and produce the same first token as the whole-prompt
    path (plan_piece edge cases: fine-tail boundaries, mixed/small
    buckets, flips mid-prompt)."""
    from pegainfer_tpu.engine.executor import PrefillStepItem

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=1024,
    )
    params = q3.init_random_params(cfg, seed=3, dtype=jnp.float32)
    rng = np.random.default_rng(123)

    def whole_first_token(prompt):
        runtime = q3.make_runtime(cfg, params, num_pages=256, page_size=4,
                                  kv_dtype=jnp.float32)
        ex = JaxExecutor(runtime, EngineLoadOptions(
            prefill_chunk=4096, enable_prefix_cache=False))
        from pegainfer_tpu.engine.executor import PrefillPlan

        item = PrefillStepItem(request_id=1, prompt_tokens=list(prompt),
                               params=SamplingParams(ignore_eos=True))
        return ex.execute_prefill(PrefillPlan(requests=[item])) \
                 .requests[0].first_token

    for trial in range(4):
        T = int(rng.integers(40, 200))
        prompt = rng.integers(2, 127, T).tolist()
        want = whole_first_token(prompt)
        runtime = q3.make_runtime(cfg, params, num_pages=256, page_size=4,
                                  kv_dtype=jnp.float32)
        ex = JaxExecutor(runtime, EngineLoadOptions(
            prefill_chunk=32, prefill_chunk_mixed=16,
            enable_prefix_cache=False))
        item = PrefillStepItem(request_id=1, prompt_tokens=list(prompt),
                               params=SamplingParams(ignore_eos=True))
        gen_ = ex.prefill_stepper(item)
        ends = []
        while True:
            ex.decode_active = bool(rng.integers(0, 2))
            try:
                ends.append(next(gen_))
            except StopIteration as s:
                got = s.value.first_token
                break
        # interior ends strictly increasing, page-aligned, < T
        assert all(e % 4 == 0 and e < T for e in ends), (T, ends)
        assert ends == sorted(set(ends)), (T, ends)
        assert got == want, (T, ends)
