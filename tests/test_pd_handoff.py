"""PD handoff: a prefilled request moves between executors token-exactly.

engine/pd.py — prefill on executor A, ship the payload (host numpy),
import into executor B (own pool, own state, different page ids), decode
there. Greedy tokens must equal a single-executor run. The hybrid variant
proves the GDN/conv state rows really ride the payload (without them the
continuation would diverge immediately).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pegainfer_tpu.engine import pd
from pegainfer_tpu.engine.contract import EngineLoadOptions, SamplingParams
from pegainfer_tpu.engine.executor import (
    DecodePlan,
    DecodeStepItem,
    PrefillStepItem,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor


def decode_n(ex, rid, first_token, n):
    params = SamplingParams(ignore_eos=True)
    toks = [first_token]
    for _ in range(n):
        res = ex.execute_decode(DecodePlan(requests=[
            DecodeStepItem(request_id=rid, token_id=toks[-1], params=params)
        ]))
        toks.append(res.requests[0].token)
    return toks


def run_single(make_ex, prompt, n):
    ex = make_ex()
    item = PrefillStepItem(request_id=1, prompt_tokens=list(prompt),
                           params=SamplingParams(ignore_eos=True))
    from pegainfer_tpu.engine.executor import PrefillPlan

    res = ex.execute_prefill(PrefillPlan(requests=[item]))
    return decode_n(ex, 1, res.requests[0].first_token, n)


def run_handoff(make_ex, prompt, n, scramble_pool=False):
    ex_a = make_ex()
    ex_b = make_ex()
    if scramble_pool:
        # churn B's allocator so the imported request lands on different
        # page ids than it held on A (prefill + release a throwaway req —
        # works for both the Python and native accounting backends)
        from pegainfer_tpu.engine.executor import PrefillPlan

        dummy = PrefillStepItem(request_id=999, prompt_tokens=[3, 4, 5],
                                params=SamplingParams(ignore_eos=True))
        ex_b.execute_prefill(PrefillPlan(requests=[dummy]))
    item = PrefillStepItem(request_id=7, prompt_tokens=list(prompt),
                           params=SamplingParams(ignore_eos=True))
    payload = pd.prefill_and_export(ex_a, item)
    assert payload.prompt_len == len(prompt)
    # A released everything
    assert ex_a.acct.get(7) is None or not ex_a.acct.get(7).pages
    pd.import_request(ex_b, payload)
    return decode_n(ex_b, 7, payload.first_token, n)


def _make_qwen3():
    from pegainfer_tpu.models import qwen3 as q3

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=41, dtype=jnp.float32)

    def make():
        runtime = q3.make_runtime(cfg, params, num_pages=32, page_size=4,
                                  kv_dtype=jnp.float32)
        return JaxExecutor(runtime, EngineLoadOptions(
            enable_prefix_cache=False))

    return make


def _make_qwen35():
    from tests.test_prefix_cache import _tiny_qwen35
    from pegainfer_tpu.models import qwen35 as q35

    cfg, params = _tiny_qwen35()

    def make():
        runtime = q35.make_runtime(cfg, params, num_pages=32, page_size=4,
                                   max_slots=4, kv_dtype=jnp.float32,
                                   use_pallas=False)
        return JaxExecutor(runtime, EngineLoadOptions(
            enable_prefix_cache=False))

    return make


def test_pd_qwen3_token_parity():
    make = _make_qwen3()
    rng = np.random.default_rng(2)
    prompt = rng.integers(2, 127, 19).tolist()
    single = run_single(make, prompt, 8)
    moved = run_handoff(make, prompt, 8, scramble_pool=True)
    assert moved == single

    # logit-level check (tokens can degenerate to a constant on tiny
    # random models): the first decode logprob after a handoff must equal
    # the single-executor one bit-for-bit — same pages, different ids.
    def first_logprob(handoff):
        ex = make()
        item = PrefillStepItem(request_id=3, prompt_tokens=list(prompt),
                               params=SamplingParams(ignore_eos=True))
        if handoff:
            src = make()
            payload = pd.prefill_and_export(src, item)
            pd.import_request(ex, payload)
            first = payload.first_token
        else:
            from pegainfer_tpu.engine.executor import PrefillPlan

            res = ex.execute_prefill(PrefillPlan(requests=[item]))
            first = res.requests[0].first_token
        r = ex.execute_decode(DecodePlan(requests=[
            DecodeStepItem(request_id=3, token_id=first,
                           params=SamplingParams(ignore_eos=True),
                           logprobs=1)
        ]))
        return r.requests[0].logprob.logprob

    assert first_logprob(True) == first_logprob(False)


def test_pd_qwen35_state_rides_payload():
    make = _make_qwen35()
    rng = np.random.default_rng(4)
    prompt = rng.integers(2, 255, 23).tolist()
    single = run_single(make, prompt, 8)
    moved = run_handoff(make, prompt, 8, scramble_pool=True)
    assert moved == single

    # negative control: dropping the state snapshot must shift the decode
    # distribution (the GDN recurrence is position-dependent), proving the
    # payload's state part is load-bearing. Tokens alone can coincide on a
    # tiny random model (it saturates to a constant token), so compare the
    # first-step logprob, which reads the logits directly.
    def first_logprob(with_state):
        ex_a = make()
        ex_b = make()
        item = PrefillStepItem(request_id=9, prompt_tokens=list(prompt),
                               params=SamplingParams(ignore_eos=True))
        payload = pd.prefill_and_export(ex_a, item)
        assert payload.state_snap is not None
        if not with_state:
            payload.state_snap = None
        pd.import_request(ex_b, payload)
        res = ex_b.execute_decode(DecodePlan(requests=[
            DecodeStepItem(request_id=9, token_id=payload.first_token,
                           params=SamplingParams(ignore_eos=True),
                           logprobs=1)
        ]))
        return res.requests[0].logprob.logprob

    lp_ok, lp_broken = first_logprob(True), first_logprob(False)
    assert abs(lp_ok - lp_broken) > 1e-6


def _make_dsv4():
    from pegainfer_tpu.models import dsv4, dsv4_engine

    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=32, moe_inter_dim=16, n_layers=2,
        num_attention_heads=8, head_dim=16, q_lora_rank=16,
        qk_rope_head_dim=8, o_groups=8, o_lora_rank=4, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=16, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4), yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.init_random_params(cfg, seed=11, dtype=jnp.float32,
                                     scale=0.08)

    def make(enable_prefix_cache=False):
        runtime = dsv4_engine.make_runtime(cfg, params, max_model_len=64,
                                           max_slots=2,
                                           state_dtype=jnp.float32)
        return JaxExecutor(runtime, EngineLoadOptions(
            enable_prefix_cache=enable_prefix_cache))

    return make


def test_pd_dsv4_slot_payload():
    """DSv4 has no paged KV — the slot snapshot (window ring + compressed
    rows + running compressor stats) is the whole payload. Token parity +
    a negative control proving the rows are load-bearing."""
    make = _make_dsv4()
    rng = np.random.default_rng(6)
    prompt = rng.integers(2, 127, 21).tolist()
    single = run_single(make, prompt, 6)
    moved = run_handoff(make, prompt, 6)
    assert moved == single

    def first_logprob(with_state):
        ex_a = make()
        ex_b = make()
        item = PrefillStepItem(request_id=5, prompt_tokens=list(prompt),
                               params=SamplingParams(ignore_eos=True))
        payload = pd.prefill_and_export(ex_a, item)
        assert payload.kv_rows is None and payload.state_snap is not None
        if not with_state:
            payload.state_snap = None
        pd.import_request(ex_b, payload)
        res = ex_b.execute_decode(DecodePlan(requests=[
            DecodeStepItem(request_id=5, token_id=payload.first_token,
                           params=SamplingParams(ignore_eos=True),
                           logprobs=1)
        ]))
        return res.requests[0].logprob.logprob

    lp_ok, lp_broken = first_logprob(True), first_logprob(False)
    assert abs(lp_ok - lp_broken) > 1e-6


def test_pd_unsupported_model_raises():
    class Rt:
        export_pages_fn = None
        slot_export_fn = None

    class Ex:
        rt = Rt()

    with pytest.raises(ValueError, match="no PD support"):
        pd.prefill_and_export(Ex(), None)
