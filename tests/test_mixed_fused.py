"""Fused ragged mixed step (prefill chunk rows ‖ decode rows in ONE
dispatch) == the separate chunk + decode dispatches, bit-level and through
the engine. Reference analog: pegainfer-qwen3-4b/src/unified_forward.rs
(GEMMs over [prefill ‖ decode] in one batch, attention split)."""

import os
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def _cfg():
    return q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=1024,
    )


def test_mixed_chunk_wa_matches_separate():
    """One fused dispatch == prefill_chunk_wa + decode_wa run sequentially
    on the same pool (f32, bit-exact chunk logits/pends/pool)."""
    cfg = _cfg()
    params = q3.init_random_params(cfg, seed=5, dtype=jnp.float32)
    ps = 4
    rng = np.random.default_rng(0)

    def fresh_pool():
        return q3.make_kv_pages(cfg, 32, ps, dtype=jnp.float32)

    # decode rows: two requests with 9 and 13 tokens of existing KV
    # (pages 1-3 / 4-7), plus the prefilling request's first chunk in
    # pages 8-9 (start_pos=8 for its second chunk in pages 10-11)
    dec_lens = [9, 13]
    dec_tables = np.full((2, 8), 0, np.int32)
    dec_tables[0, :3] = [1, 2, 3]
    dec_tables[1, :4] = [4, 5, 6, 7]
    pre_table = np.full(8, 0, np.int32)
    pre_table[:4] = [8, 9, 10, 11]

    fill_shape = np.asarray(fresh_pool()[:, :, 1:12]).shape
    fill = jnp.asarray(rng.standard_normal(fill_shape).astype(np.float32))

    def seed_pool(kv):
        # fill the existing-KV region with (fixed) deterministic values
        return kv.at[:, :, 1:12].set(fill)

    chunk_toks = jnp.asarray(rng.integers(2, 128, 8), jnp.int32)
    dec_toks = jnp.asarray(rng.integers(2, 128, 2), jnp.int32)
    dec_pos = jnp.asarray([l - 1 for l in dec_lens], jnp.int32)
    dec_sl = jnp.asarray(dec_lens, jnp.int32)
    dtabs = jnp.asarray(dec_tables)
    ptab = jnp.asarray(pre_table)

    cpend0 = q3.make_chunk_pend(cfg, 2, ps, jnp.float32)
    # non-empty previous chunk pend (pages 8-9) + previous decode pend
    rows = jnp.asarray(rng.standard_normal(
        np.asarray(cpend0["rows"]).shape).astype(np.float32))
    cpend0 = {"rows": rows, "pages": jnp.asarray([8, 9], jnp.int32)}
    dpend0 = q3.make_pend(cfg, 2, jnp.float32)
    drows = jnp.asarray(rng.standard_normal(
        np.asarray(dpend0["rows"]).shape).astype(np.float32))
    dpend0 = {"rows": drows,
              "page_ids": jnp.asarray([3, 7], jnp.int32),
              "slots": jnp.asarray([0, 0], jnp.int32)}

    # fused
    kv_f = seed_pool(fresh_pool())
    kv_f, cpend_f, dpend_f, last_f, dec_f = q3.mixed_chunk_wa(
        cfg, params, kv_f, cpend0, dpend0, chunk_toks, jnp.int32(8),
        jnp.int32(8), ptab, dec_toks, dec_pos, dtabs, dec_sl)

    # separate: decode first or chunk first must not matter (disjoint
    # pages); run chunk then decode like the interleave would
    kv_s = seed_pool(fresh_pool())
    kv_s, cpend_s, last_s = q3.prefill_chunk_wa(
        cfg, params, kv_s, cpend0, chunk_toks, jnp.int32(8), jnp.int32(8),
        ptab)
    kv_s, dpend_s, dec_s = q3.decode_wa(
        cfg, params, kv_s, dpend0, dec_toks, dec_pos, dtabs, dec_sl)

    # XLA blocks GEMM reductions differently per batch shape ([Tc+B] rows
    # vs [Tc]/[B]) — per-row sums can differ in the last f32 ulp; bound by
    # a tight absolute tolerance, and argmax equality for the logits
    np.testing.assert_allclose(np.asarray(last_f), np.asarray(last_s),
                               rtol=0, atol=1e-5)
    assert int(np.argmax(last_f)) == int(np.argmax(last_s))
    np.testing.assert_allclose(np.asarray(dec_f), np.asarray(dec_s),
                               rtol=0, atol=1e-5)
    assert (np.argmax(np.asarray(dec_f), -1)
            == np.argmax(np.asarray(dec_s), -1)).all()
    for k in ("rows", "pages"):
        np.testing.assert_allclose(np.asarray(cpend_f[k]),
                                   np.asarray(cpend_s[k]), rtol=0, atol=1e-5)
    for k in ("rows", "page_ids", "slots"):
        np.testing.assert_allclose(np.asarray(dpend_f[k]),
                                   np.asarray(dpend_s[k]), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kv_f), np.asarray(kv_s),
                               rtol=0, atol=1e-5)


def _make_engine(prefill_chunk, fused, cfg=None):
    os.environ["PEGAINFER_MIXED_FUSED"] = "1" if fused else "0"
    try:
        cfg = cfg or _cfg()
        params = q3.init_random_params(cfg, seed=3, dtype=jnp.float32)
        runtime = q3.make_runtime(cfg, params, num_pages=128, page_size=4,
                                  kv_dtype=jnp.float32)
        ex = JaxExecutor(runtime,
                         EngineLoadOptions(prefill_chunk=prefill_chunk))
        assert ex._mixed_enabled == fused
        return start_scheduler(ex)
    finally:
        os.environ.pop("PEGAINFER_MIXED_FUSED", None)


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


@pytest.mark.parametrize("fused", [True, False])
def test_engine_mixed_streams_match_solo(fused):
    """Streams under a mixed load (fused or time-sliced) produce the same
    tokens as solo runs."""
    rng = np.random.default_rng(7)
    short = rng.integers(2, 128, 6).tolist()
    long_p = rng.integers(2, 128, 80).tolist()

    solo = _make_engine(prefill_chunk=16, fused=False)
    try:
        want_short = _gen(solo, short, 24)
        want_long = _gen(solo, long_p, 8)
    finally:
        solo.shutdown()

    handle = _make_engine(prefill_chunk=16, fused=fused)
    try:
        r1 = GenerateRequest(prompt_tokens=short, max_tokens=24,
                             params=SamplingParams(ignore_eos=True))
        handle.submit(r1)
        time.sleep(0.3)  # let r1 reach steady decode
        r2 = GenerateRequest(prompt_tokens=long_p, max_tokens=8,
                             params=SamplingParams(ignore_eos=True))
        handle.submit(r2)

        out1 = [ev.id for ev in r1.channel if isinstance(ev, Token)]
        out2 = [ev.id for ev in r2.channel if isinstance(ev, Token)]
        assert out1 == want_short
        assert out2 == want_long
    finally:
        handle.shutdown()


def test_engine_mixed_fused_eos_mid_prefill():
    """A decode stream that EOS-finishes while a chunked prefill is in
    flight must not crash the fused pipeline: the speculative piece still
    in flight carries a row for the finished request, whose tokens must be
    discarded (regression for the flush_prev KeyError that
    _fail_touched-aborted the whole step)."""
    import dataclasses

    # seed 1 probed: greedy stream is [20]*8 then 75… — the first fresh
    # token appears at index 8, deep enough that the EOS lands while the
    # long prefill's chunks interleave (deterministic coverage of the
    # discard itself lives in test_scheduler's MixedFusedFakeExecutor
    # tests; this is the end-to-end engine exercise)
    rng = np.random.default_rng(1)
    short = rng.integers(2, 128, 6).tolist()
    long_p = rng.integers(2, 128, 160).tolist()

    solo = _make_engine(prefill_chunk=8, fused=False)
    try:
        ref = _gen(solo, short, 40)
        want_long = _gen(solo, long_p, 4)
    finally:
        solo.shutdown()

    stop_tok = stop_idx = None
    for i in range(1, len(ref)):
        if ref[i] not in ref[:i]:
            stop_tok, stop_idx = ref[i], i
            break
    assert stop_tok is not None, "degenerate greedy stream"

    cfg = dataclasses.replace(_cfg(), stop_token_ids=(1, stop_tok))
    handle = _make_engine(prefill_chunk=8, fused=True, cfg=cfg)
    try:
        r1 = GenerateRequest(prompt_tokens=short, max_tokens=40,
                             params=SamplingParams(ignore_eos=False))
        handle.submit(r1)
        time.sleep(0.1)
        r2 = GenerateRequest(prompt_tokens=long_p, max_tokens=4,
                             params=SamplingParams(ignore_eos=True))
        handle.submit(r2)

        evs1 = list(r1.channel)
        evs2 = list(r2.channel)
        out1 = [ev.id for ev in evs1 if isinstance(ev, Token)]
        fin1 = [ev for ev in evs1 if isinstance(ev, Finished)]
        out2 = [ev.id for ev in evs2 if isinstance(ev, Token)]
        fin2 = [ev for ev in evs2 if isinstance(ev, Finished)]
        # r1 stops exactly at the EOS position with reason STOP (no Error)
        assert out1 == ref[:stop_idx]
        assert len(fin1) == 1 and fin1[0].finish_reason.name == "STOP"
        # the prefill stream survives the mid-flight finish untouched
        assert out2 == want_long
        assert len(fin2) == 1 and fin2[0].finish_reason.name == "LENGTH"
    finally:
        handle.shutdown()


def test_engine_mixed_fused_non_greedy():
    """Fused mixed step with a SAMPLING decode stream: deterministic for a
    fixed scheduler seed (two fused runs match), and the prefill stream is
    unaffected (greedy — matches its solo tokens). Exact fused-vs-unfused
    equality is NOT expected for sampling: the scheduler RNG draw sequence
    depends on block grouping (same as time-sliced block-size changes)."""
    rng = np.random.default_rng(11)
    short = rng.integers(2, 128, 6).tolist()
    long_p = rng.integers(2, 128, 60).tolist()

    solo = _make_engine(prefill_chunk=16, fused=False)
    try:
        want_long = _gen(solo, long_p, 6)
    finally:
        solo.shutdown()

    handle = _make_engine(prefill_chunk=16, fused=True)
    try:
        r1 = GenerateRequest(
            prompt_tokens=short, max_tokens=20,
            params=SamplingParams(temperature=0.8, top_k=20,
                                  ignore_eos=True),
        )
        handle.submit(r1)
        time.sleep(0.3)
        r2 = GenerateRequest(prompt_tokens=long_p, max_tokens=6,
                             params=SamplingParams(ignore_eos=True))
        handle.submit(r2)
        out1 = [ev.id for ev in r1.channel if isinstance(ev, Token)]
        out2 = [ev.id for ev in r2.channel if isinstance(ev, Token)]
        assert out2 == want_long  # greedy prefill stream unaffected
        assert len(out1) == 20
        assert all(0 <= t < 128 for t in out1)
    finally:
        handle.shutdown()


def test_engine_mixed_fused_logprobs_stream():
    """A logprobs-requesting decode stream keeps the FUSED path (VERDICT
    r4 weak #6): tokens match the solo run and every token carries the
    chosen logprob + top-k, matching the unfused logprobs surface."""
    rng = np.random.default_rng(7)
    short = rng.integers(2, 128, 6).tolist()
    long_p = rng.integers(2, 128, 80).tolist()

    def gen_lp(handle, prompt, n, logprobs):
        req = GenerateRequest(prompt_tokens=prompt, max_tokens=n,
                              params=SamplingParams(ignore_eos=True),
                              logprobs=logprobs)
        handle.submit(req)
        toks, lps = [], []
        for ev in req.channel:
            if isinstance(ev, Token):
                toks.append(ev.id)
                lps.append(ev.logprob)
            elif isinstance(ev, Finished):
                break
        return toks, lps

    solo = _make_engine(prefill_chunk=16, fused=False)
    try:
        want_toks, want_lps = gen_lp(solo, short, 24, 2)
        want_long = _gen(solo, long_p, 8)
    finally:
        solo.shutdown()

    handle = _make_engine(prefill_chunk=16, fused=True)
    try:
        req = GenerateRequest(prompt_tokens=short, max_tokens=24,
                              params=SamplingParams(ignore_eos=True),
                              logprobs=2)
        handle.submit(req)
        time.sleep(0.3)
        r2 = GenerateRequest(prompt_tokens=long_p, max_tokens=8,
                             params=SamplingParams(ignore_eos=True))
        handle.submit(r2)
        toks, lps = [], []
        for ev in req.channel:
            if isinstance(ev, Token):
                toks.append(ev.id)
                lps.append(ev.logprob)
            elif isinstance(ev, Finished):
                break
        out2 = [ev.id for ev in r2.channel if isinstance(ev, Token)]
        assert toks == want_toks
        assert out2 == want_long
        for got, want in zip(lps, want_lps):
            assert got is not None and want is not None
            assert len(got.top_logprobs) == 2
            np.testing.assert_allclose(got.logprob, want.logprob,
                                       rtol=0, atol=1e-4)
            assert [i for i, _ in got.top_logprobs] == \
                [i for i, _ in want.top_logprobs]
    finally:
        handle.shutdown()
