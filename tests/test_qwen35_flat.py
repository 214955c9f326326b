"""Qwen3.5 flat UNION decode layout (round 3): parity vs the grouped path.

The grouped layout streams decode weights at ~250 GB/s because XLA's scan
prefetch fails on multi-layer xs slices; the flat per-layer union scan
reaches ~600 GB/s (measured on-chip: engine TPOT 15.11 → 8.74 ms,
docs/PERF.md). These tests pin: exact weight roundtrip, prefill parity,
decode equivalence (bf16-ulp tolerance — the two graphs fuse differently),
and int8 composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.models import qwen35 as q35


def tiny_cfg():
    return q35.Qwen35Config(
        hidden_size=128, intermediate_size=256, num_hidden_layers=8,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        vocab_size=512, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25,
        layer_types=("linear_attention",) * 3 + ("full_attention",),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, tie_word_embeddings=False,
        eos_token_id=0, stop_token_ids=(0,), max_position_embeddings=512,
    )


def test_union_roundtrip_exact():
    """to_union → _grouped_view reproduces every grouped leaf exactly
    (pins the packing offsets). to_union CONSUMES its input."""
    cfg = tiny_cfg()
    params = q35.init_random_params(cfg, seed=3)
    up = q35.to_union(cfg, params)
    ref = q35.init_random_params(cfg, seed=3)
    gv = q35._grouped_view(cfg, up)
    for part in ("lin", "full"):
        for k, v in ref[part].items():
            np.testing.assert_array_equal(
                np.asarray(v, np.float32),
                np.asarray(gv[part][k], np.float32), err_msg=f"{part}.{k}")


def test_union_roundtrip_int8():
    cfg = tiny_cfg()
    params = q35.quantize_params_int8(q35.init_random_params(cfg, seed=4))
    ref = q35.quantize_params_int8(q35.init_random_params(cfg, seed=4))
    up = q35.to_union(cfg, params)
    gv = q35._grouped_view(cfg, up)
    for part in ("lin", "full"):
        for k, v in ref[part].items():
            if isinstance(v, dict):
                np.testing.assert_array_equal(
                    np.asarray(v["q8"]), np.asarray(gv[part][k]["q8"]),
                    err_msg=f"{part}.{k}.q8")
                np.testing.assert_array_equal(
                    np.asarray(v["s"]), np.asarray(gv[part][k]["s"]),
                    err_msg=f"{part}.{k}.s")
            else:
                np.testing.assert_array_equal(
                    np.asarray(v, np.float32),
                    np.asarray(gv[part][k], np.float32),
                    err_msg=f"{part}.{k}")


def test_flat_prefill_matches_grouped_f32():
    """The flat prefill scan computes IDENTICAL math to the grouped path:
    in f32 (no rounding at the differing fusion points) logits and all
    post-prefill state are bit-exact."""
    cfg = tiny_cfg()

    def f32(p):
        return jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a,
            p)

    params = f32(q35.init_random_params(cfg, seed=3))
    up = q35.to_union(cfg, f32(q35.init_random_params(cfg, seed=3)))
    s1 = q35.make_state(cfg, 12, 8, max_slots=2)
    s2 = q35.make_state(cfg, 12, 8, max_slots=2)
    toks = jnp.asarray([3, 17, 42, 9, 88, 5, 6, 7], jnp.int32)
    pt = jnp.asarray([1], jnp.int32)
    s1, l1, _ = q35.prefill(cfg, params, s1, toks, jnp.int32(8), pt, jnp.int32(0))
    s2, l2, _ = q35.prefill(cfg, up, s2, toks, jnp.int32(8), pt, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for k in ("kv", "rec", "conv"):
        np.testing.assert_array_equal(np.asarray(s1[k]), np.asarray(s2[k]))


def test_flat_decode_matches_grouped():
    """prefill and decode agree to bf16 rounding (the flat and grouped
    graphs fuse differently — ulp-level divergence compounds over layers;
    values and argmax must still agree; the f32 test above pins that the
    math itself is identical)."""
    cfg = tiny_cfg()
    params = q35.init_random_params(cfg, seed=3)
    up = q35.to_union(cfg, params)
    params = q35.init_random_params(cfg, seed=3)

    num_pages, ps = 12, 8
    s1 = q35.make_state(cfg, num_pages, ps, max_slots=2)
    s2 = q35.make_state(cfg, num_pages, ps, max_slots=2)
    toks = jnp.asarray([3, 17, 42, 9, 88, 5, 6, 7], jnp.int32)
    pt = jnp.asarray([1], jnp.int32)
    s1, l1, _ = q35.prefill(cfg, params, s1, toks, jnp.int32(8), pt, jnp.int32(0))
    s2, l2, _ = q35.prefill(cfg, up, s2, toks, jnp.int32(8), pt, jnp.int32(0))
    a, b = np.asarray(l1, np.float32), np.asarray(l2, np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert int(np.argmax(a)) == int(np.argmax(b))
    # State comparison is distributional: rounding at the differing fusion
    # points compounds over layers, so a handful of bf16 KV entries land a
    # few ulp apart (≤0.3% observed). The f32 test above pins exactness;
    # here require ≥99% within tolerance and a hard cap on the outliers.
    for k in ("kv", "rec", "conv"):
        va = np.asarray(s1[k], np.float32)
        vb = np.asarray(s2[k], np.float32)
        bad = np.abs(va - vb) > (0.05 + 0.05 * np.abs(vb))
        assert bad.mean() < 0.01, f"{k}: {bad.mean():.4f} outside tolerance"
        assert np.max(np.abs(va - vb)) < 0.5, f"{k} outlier too large"

    B = 2
    dt = jnp.asarray([7, 0], jnp.int32)
    pos = jnp.asarray([8, 0], jnp.int32)
    tables = jnp.zeros((B, 2), jnp.int32).at[0, 0].set(1).at[0, 1].set(2)
    sl = jnp.asarray([9, 0], jnp.int32)
    slots = jnp.asarray([0, 2], jnp.int32)
    toks_out = []
    for p, s in ((params, s1), (up, s2)):
        _, lg = q35.decode(cfg, p, s, dt, pos, tables, sl, slots)
        toks_out.append(lg)
    a, b = (np.asarray(x[0], np.float32) for x in toks_out)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert int(np.argmax(a)) == int(np.argmax(b))


def test_engine_flat_generates():
    """Engine e2e through the flat layout (the tp=1 serving default)."""
    from pegainfer_tpu.engine.contract import (
        EngineLoadOptions, GenerateRequest, SamplingParams, Token,
    )
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler

    cfg = tiny_cfg()
    params = q35.init_random_params(cfg, seed=5)
    rt = q35.make_runtime(cfg, params, num_pages=24, page_size=8,
                          max_slots=4, flat_decode=True)
    assert "union" in rt.params
    handle = start_scheduler(JaxExecutor(
        rt, EngineLoadOptions(precompile=False, max_batch_size=2,
                              max_model_len=64)))
    try:
        req = GenerateRequest(prompt_tokens=[3, 17, 42, 9, 88], max_tokens=6,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        toks = [ev.id for ev in req.channel if isinstance(ev, Token)]
        assert len(toks) == 6
        assert len(set(toks)) > 1 or toks[0] != 0
    finally:
        handle.shutdown()


def test_flat_chunked_prefill_matches_grouped_f32():
    """prefill_chunk_wa_flat == prefill_chunk_wa on grouped params,
    bit-exact in f32, over a 4-chunk continuation (pins the flat-index
    gi/j derivation, start_pos>0 GDN/conv state continuation, kv splice
    and cpend row layout — ADVICE r3 #1)."""
    cfg = tiny_cfg()

    def f32(p):
        return jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a,
            p)

    params = f32(q35.init_random_params(cfg, seed=6))
    up = q35.to_union(cfg, f32(q35.init_random_params(cfg, seed=6)))
    num_pages, ps = 12, 8
    Tc = 16  # 2 pages per chunk
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, 4 * Tc)
    pt = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8], jnp.int32)

    outs = []
    for p, mode in ((params, "grouped"), (up, "flat"), (up, "grouped")):
        state = jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a,
            q35.make_state(cfg, num_pages, ps, max_slots=2))
        cpend = jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a,
            q35.make_chunk_pend(cfg, 2, ps, 2))
        last = None
        for ci in range(4):
            toks = jnp.asarray(prompt[ci * Tc:(ci + 1) * Tc], jnp.int32)
            state, cpend, last = q35.prefill_chunk_wa(
                cfg, p, state, cpend, toks, jnp.int32(ci * Tc),
                jnp.int32(Tc), pt, jnp.int32(0), mode=mode)
        state = q35.flush_chunk_pend(state, cpend)
        outs.append((np.asarray(last), jax.tree.map(np.asarray, state)))

    # flat vs grouped path on the SAME union params: bit-exact
    (l_ref, s_ref), (l_flat, s_flat), (l_grp, s_grp) = outs
    np.testing.assert_array_equal(l_flat, l_grp)
    for k in ("kv", "rec", "conv"):
        np.testing.assert_array_equal(s_flat[k], s_grp[k], err_msg=k)
    # and equal to the native grouped params run
    np.testing.assert_array_equal(l_flat, l_ref)
    for k in ("kv", "rec", "conv"):
        np.testing.assert_array_equal(s_flat[k], s_ref[k], err_msg=k)
