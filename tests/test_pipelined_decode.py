"""Async pipelined decode: correctness under arrivals, EOS, and sampling.

The pipeline speculatively dispatches step i+1 on device-resident tokens
before reading step i (jax_executor.PendingDecode); these tests pin the
scheduler-visible semantics: token streams identical to the sync path,
mid-stream arrivals join the batch, EOS/length finishes drop speculative
rows.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions,
    Finished,
    FinishReason,
    GenerateRequest,
    SamplingParams,
    Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen3 as q3


@pytest.fixture(scope="module")
def engine():
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=7, dtype=jnp.float32)
    runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                              kv_dtype=jnp.float32)
    ex = JaxExecutor(runtime, EngineLoadOptions(max_batch_size=8))
    handle = start_scheduler(ex)
    yield handle
    handle.shutdown()


def collect(req):
    toks, finish = [], None
    for ev in req.channel:
        if isinstance(ev, Token):
            toks.append(ev.id)
        elif isinstance(ev, Finished):
            finish = ev.finish_reason
    return toks, finish


def test_single_stream_deterministic(engine):
    p = [5, 9, 13]
    runs = []
    for _ in range(2):
        req = GenerateRequest(prompt_tokens=p, max_tokens=12,
                              params=SamplingParams(ignore_eos=True))
        engine.submit(req)
        runs.append(collect(req))
    assert runs[0] == runs[1]
    assert len(runs[0][0]) == 12
    assert runs[0][1] == FinishReason.LENGTH


def test_concurrent_streams_and_arrival_during_pipeline(engine):
    reqs = []
    for i in range(4):
        r = GenerateRequest(prompt_tokens=[3 + i, 40 + i], max_tokens=16,
                            params=SamplingParams(ignore_eos=True))
        engine.submit(r)
        reqs.append(r)
    # a later arrival must interrupt + join the running pipeline
    late = GenerateRequest(prompt_tokens=[99], max_tokens=8,
                           params=SamplingParams(ignore_eos=True))
    engine.submit(late)
    outs = [collect(r) for r in reqs]
    late_out = collect(late)
    assert all(len(t) == 16 and f == FinishReason.LENGTH for t, f in outs)
    assert len(late_out[0]) == 8

    # batch results must equal a solo run of the same prompt
    solo = GenerateRequest(prompt_tokens=[3, 40], max_tokens=16,
                           params=SamplingParams(ignore_eos=True))
    engine.submit(solo)
    solo_toks, _ = collect(solo)
    assert solo_toks == outs[0][0]


def test_sampled_stream_reproducible(engine):
    """Same engine seed ordering isn't guaranteed across submissions, but a
    sampled request must terminate and produce max_tokens tokens."""
    req = GenerateRequest(
        prompt_tokens=[7, 8, 9], max_tokens=10,
        params=SamplingParams(temperature=0.8, top_k=20, top_p=0.9,
                              ignore_eos=True),
    )
    engine.submit(req)
    toks, finish = collect(req)
    assert len(toks) == 10
    assert finish == FinishReason.LENGTH
    assert all(0 <= t < 128 for t in toks)


def test_kv_pressure_many_requests_all_complete(engine):
    """More concurrent requests than the page pool can hold at once: the
    full-lifetime admission rule must defer (never deadlock, never reject
    feasible work) and every request must finish (the reference's
    kv-pressure-hang class, docs/models/qwen3/kv-pressure-hang.md)."""
    import threading

    results = {}

    def run(i):
        req = GenerateRequest(prompt_tokens=[2 + i, 30 + i, 60 + i],
                              max_tokens=20,
                              params=SamplingParams(ignore_eos=True))
        engine.submit(req)
        toks, finish = collect(req)
        results[i] = (len(toks), finish)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 12
    for i, (n, finish) in results.items():
        assert n == 20, (i, n)
        assert finish == FinishReason.LENGTH


def test_slot_exhaustion_defers_not_crashes():
    """More concurrent requests than state slots: overflow must wait for a
    free slot, not crash the prefill plan."""
    import threading

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=7, dtype=jnp.float32)
    runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                              kv_dtype=jnp.float32)
    runtime.max_slots = 3  # tiny slot pool
    handle = start_scheduler(JaxExecutor(runtime, EngineLoadOptions(max_batch_size=8)))
    try:
        results = {}

        def run(i):
            req = GenerateRequest(prompt_tokens=[2 + i, 9 + i], max_tokens=6,
                                  params=SamplingParams(ignore_eos=True))
            handle.submit(req)
            toks, finish = collect(req)
            results[i] = (len(toks), finish)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(9)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 9
        assert all(n == 6 and f == FinishReason.LENGTH for n, f in results.values())
    finally:
        handle.shutdown()


def test_finish_admit_reuse_pages_no_corruption(engine):
    """Write-ahead pend hazard: request A finishes (pages freed), request B
    is admitted and may reuse A's pages, THEN A's stale pend is flushed —
    the flush must mask dead rows to the null page, or B's fresh KV gets
    corrupted. B's output must equal a solo run of the same prompt."""
    a = GenerateRequest(prompt_tokens=[11, 12, 13], max_tokens=4,
                        params=SamplingParams(ignore_eos=True))
    keeper = GenerateRequest(prompt_tokens=[21], max_tokens=24,
                             params=SamplingParams(ignore_eos=True))
    engine.submit(a)
    engine.submit(keeper)  # keeps the pipeline running while A ends
    a_toks, a_fin = collect(a)
    assert len(a_toks) == 4 and a_fin == FinishReason.LENGTH
    # admitted after A finished: can land on A's freed pages while A's pend
    # (from the speculative block) is still unflushed
    b = GenerateRequest(prompt_tokens=[31, 32], max_tokens=16,
                        params=SamplingParams(ignore_eos=True))
    engine.submit(b)
    b_toks, _ = collect(b)
    collect(keeper)
    solo = GenerateRequest(prompt_tokens=[31, 32], max_tokens=16,
                           params=SamplingParams(ignore_eos=True))
    engine.submit(solo)
    solo_toks, _ = collect(solo)
    assert b_toks == solo_toks


def test_mixed_greedy_and_sampled_batch(engine):
    """Greedy and sampled requests decoding in the same batch: the fused
    sampler handles per-row temperature (0 = exact argmax)."""
    import threading

    results = {}

    def run(i, params):
        req = GenerateRequest(prompt_tokens=[5 + i, 40], max_tokens=8,
                              params=params)
        engine.submit(req)
        results[i] = collect(req)

    threads = [
        threading.Thread(target=run, args=(0, SamplingParams(ignore_eos=True))),
        threading.Thread(target=run, args=(1, SamplingParams(
            temperature=0.9, top_k=30, ignore_eos=True))),
        threading.Thread(target=run, args=(2, SamplingParams(ignore_eos=True))),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(len(results[i][0]) == 8 for i in range(3))
    # greedy rows must equal a solo greedy run
    solo = GenerateRequest(prompt_tokens=[5, 40], max_tokens=8,
                           params=SamplingParams(ignore_eos=True))
    engine.submit(solo)
    assert collect(solo)[0] == results[0][0]


def test_deep_pipeline_matches_default():
    """decode_pipeline_depth=4 with small blocks (the delivery profile)
    produces exactly the default profile's tokens, including an EOS finish
    inside the speculative window (rows for the finished request are
    discarded) and a LENGTH boundary (never speculates past the budget)."""
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=7, dtype=jnp.float32)

    def run(opts):
        runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                                  kv_dtype=jnp.float32)
        handle = start_scheduler(JaxExecutor(runtime, opts))
        try:
            out = []
            for p, n in (([5, 9, 13], 30), ([7, 11], 17)):
                req = GenerateRequest(prompt_tokens=p, max_tokens=n,
                                      params=SamplingParams(ignore_eos=True))
                handle.submit(req)
                out.append(collect(req))
            # EOS inside the window: stop on the stream's own 7th token
            ref = out[0][0]
            stop = next((t for i, t in enumerate(ref[6:], 6)
                         if t not in ref[:i]), None)
            if stop is not None:
                import dataclasses

                req = GenerateRequest(
                    prompt_tokens=[5, 9, 13], max_tokens=30,
                    params=SamplingParams(ignore_eos=False))
                # patch stop set via executor runtime (frozenset)
                handle._scheduler.executor.rt.stop_token_ids = frozenset(
                    {1, stop})
                handle.submit(req)
                out.append(collect(req))
                handle._scheduler.executor.rt.stop_token_ids = frozenset({1})
            return out
        finally:
            handle.shutdown()

    base = run(EngineLoadOptions(max_batch_size=8))
    deep = run(EngineLoadOptions(max_batch_size=8, decode_block_max=4,
                                 decode_pipeline_depth=4))
    assert base == deep
    assert base[0][1] == FinishReason.LENGTH
    if len(base) > 2:
        assert base[2][1] == FinishReason.STOP
