"""Qwen3.5 fused ragged mixed step (prefill chunk rows ‖ decode rows in ONE
dispatch) == the separate chunk + decode dispatches, and through the engine.
Reference analog: pegainfer-qwen35-4b/src/unified_forward.rs:68-154 (the
hybrid model's unified forward: prefill + decode combined, with a
decode-parity test)."""

import os
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
from pegainfer_tpu.models import qwen35 as q35


def tiny_cfg():
    return q35.Qwen35Config(
        hidden_size=128, intermediate_size=256, num_hidden_layers=8,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        vocab_size=256, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25,
        layer_types=("linear_attention",) * 3 + ("full_attention",),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, tie_word_embeddings=False,
        eos_token_id=0, stop_token_ids=(0,), max_position_embeddings=512,
    )


def _f32(p):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a, p)


def _setup(cfg, params, ps=8):
    """Build a mid-flight mixed scenario by running the REAL model paths:
    stream A prefilled (pages 1-2, slot 0) and one wa-decode step deep
    (its pend unflushed), prefilling request C one chunk deep (pages 4-5,
    slot 1, cpend unflushed). Returns everything both the fused and the
    separate continuation need."""
    state = q35.make_state(cfg, 16, ps, max_slots=4, kv_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    # A: 10-token prompt (padded to 2 pages) → pages [1, 2]
    promptA = np.zeros(16, np.int32)
    promptA[:10] = rng.integers(2, cfg.vocab_size, 10)
    ptA = jnp.asarray([1, 2], jnp.int32)
    state, lgA, _ = q35.prefill(cfg, params, state, jnp.asarray(promptA),
                                jnp.int32(10), ptA, jnp.int32(0))
    # one write-ahead decode step → non-empty dpend
    pend0 = q35.make_pend(cfg, 1, 4, jnp.float32)
    t0 = jnp.asarray([int(jnp.argmax(lgA))], jnp.int32)
    dtabs = jnp.zeros((1, 8), jnp.int32).at[0, :3].set(jnp.asarray([1, 2, 3]))
    state, dpend, dlg = q35.decode_wa(
        cfg, params, state, pend0, t0, jnp.asarray([10], jnp.int32),
        dtabs, jnp.asarray([11], jnp.int32), jnp.asarray([0], jnp.int32))
    dec_tok = jnp.asarray([int(jnp.argmax(dlg[0]))], jnp.int32)

    # C: 16-token prompt in two chunks of 8 → pages [4, 5], slot 1
    promptC = jnp.asarray(rng.integers(2, cfg.vocab_size, 16), jnp.int32)
    ptC = jnp.asarray([4, 5], jnp.int32)
    cpend0 = q35.make_chunk_pend(cfg, 1, ps, 4, jnp.float32)
    state, cpend, _ = q35.prefill_chunk_wa(
        cfg, params, state, cpend0, promptC[:8], jnp.int32(0), jnp.int32(8),
        ptC, jnp.int32(1))
    return dict(
        state=state, cpend=cpend, dpend=dpend,
        chunk_tokens=promptC[8:], start_pos=jnp.int32(8), valid=jnp.int32(8),
        page_table=ptC, slot=jnp.int32(1),
        dec_tokens=dec_tok, dec_positions=jnp.asarray([11], jnp.int32),
        dec_tables=dtabs, dec_seq_lens=jnp.asarray([12], jnp.int32),
        dec_slots=jnp.asarray([0], jnp.int32),
    )


def _run_fused(cfg, params, s):
    return q35.mixed_chunk_wa(
        cfg, params, s["state"], s["cpend"], s["dpend"], s["chunk_tokens"],
        s["start_pos"], s["valid"], s["page_table"], s["slot"],
        s["dec_tokens"], s["dec_positions"], s["dec_tables"],
        s["dec_seq_lens"], s["dec_slots"])


def _run_separate(cfg, params, s):
    state, cpend, last = q35.prefill_chunk_wa(
        cfg, params, s["state"], s["cpend"], s["chunk_tokens"],
        s["start_pos"], s["valid"], s["page_table"], s["slot"])
    state, dpend, dlg = q35.decode_wa(
        cfg, params, state, s["dpend"], s["dec_tokens"], s["dec_positions"],
        s["dec_tables"], s["dec_seq_lens"], s["dec_slots"])
    return state, cpend, dpend, last, dlg


@pytest.mark.parametrize("layout", ["grouped", "flat"])
def test_mixed_chunk_wa_matches_separate(layout):
    """One fused dispatch == prefill_chunk_wa + decode_wa run sequentially
    on the same state (f32; GEMM row-batch shapes differ → last-ulp
    tolerance + argmax equality, as in the qwen3 fused test)."""
    cfg = tiny_cfg()
    params = _f32(q35.init_random_params(cfg, seed=3))
    if layout == "flat":
        params = q35.to_union(cfg, _f32(q35.init_random_params(cfg, seed=3)))
    s = _setup(cfg, params)

    st_f, cp_f, dp_f, last_f, dlg_f = _run_fused(cfg, params, s)
    st_s, cp_s, dp_s, last_s, dlg_s = _run_separate(cfg, params, s)

    np.testing.assert_allclose(np.asarray(last_f), np.asarray(last_s),
                               rtol=0, atol=1e-5)
    assert int(np.argmax(last_f)) == int(np.argmax(last_s))
    np.testing.assert_allclose(np.asarray(dlg_f), np.asarray(dlg_s),
                               rtol=0, atol=1e-5)
    assert (np.argmax(np.asarray(dlg_f), -1)
            == np.argmax(np.asarray(dlg_s), -1)).all()
    # state/pend arrays pass through GEMMs whose row-batch blocking
    # differs between the [Tc+B] fused and [Tc]/[B] separate dispatches —
    # a few last-ulp accumulation differences on O(1) magnitudes
    for k in ("rows", "pages", "rec", "conv", "slot"):
        np.testing.assert_allclose(np.asarray(cp_f[k]), np.asarray(cp_s[k]),
                                   rtol=0, atol=5e-5, err_msg=f"cpend.{k}")
    for k in ("rows", "page_ids", "pslots", "rec", "conv", "state_slots"):
        np.testing.assert_allclose(np.asarray(dp_f[k]), np.asarray(dp_s[k]),
                                   rtol=0, atol=5e-5, err_msg=f"dpend.{k}")
    for k in ("kv", "rec", "conv"):
        np.testing.assert_allclose(np.asarray(st_f[k]), np.asarray(st_s[k]),
                                   rtol=0, atol=5e-5, err_msg=f"state.{k}")


def test_mixed_flat_matches_grouped():
    """The flat-union fused step computes the same math as the grouped one
    (f32, same tolerance class as the flat-vs-grouped decode tests)."""
    cfg = tiny_cfg()
    pg = _f32(q35.init_random_params(cfg, seed=3))
    pu = q35.to_union(cfg, _f32(q35.init_random_params(cfg, seed=3)))
    sg = _setup(cfg, pg)
    su = _setup(cfg, pu)
    _, _, _, last_g, dlg_g = _run_fused(cfg, pg, sg)
    _, _, _, last_u, dlg_u = _run_fused(cfg, pu, su)
    np.testing.assert_allclose(np.asarray(last_g), np.asarray(last_u),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dlg_g), np.asarray(dlg_u),
                               rtol=0, atol=1e-5)


def _make_engine(prefill_chunk, fused, flat_decode):
    os.environ["PEGAINFER_MIXED_FUSED"] = "1" if fused else "0"
    try:
        cfg = tiny_cfg()
        params = _f32(q35.init_random_params(cfg, seed=5))
        runtime = q35.make_runtime(cfg, params, num_pages=128, page_size=4,
                                   max_slots=8, kv_dtype=jnp.float32,
                                   use_pallas=False, flat_decode=flat_decode)
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


@pytest.mark.parametrize("fused,flat_decode", [
    (True, True), (False, True), (True, False),
])
def test_engine_mixed_streams_match_solo(fused, flat_decode):
    """A hybrid decode stream under a mixed load (fused or time-sliced,
    both layouts) produces the same tokens as its solo run."""
    rng = np.random.default_rng(7)
    short = rng.integers(2, 256, 6).tolist()
    long_p = rng.integers(2, 256, 80).tolist()

    solo = _make_engine(prefill_chunk=16, fused=False,
                        flat_decode=flat_decode)
    try:
        want_short = _gen(solo, short, 24)
        want_long = _gen(solo, long_p, 8)
    finally:
        solo.shutdown()

    handle = _make_engine(prefill_chunk=16, fused=fused,
                          flat_decode=flat_decode)
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
