"""Mid-scale bf16 numerics: reduction-order error must stay benign.

VERDICT weak #3: the HF parity oracles run 2-3-layer/64-dim f32 configs,
which validates the math but not bf16 reduction behavior at depth (the
reference fought bf16 reduction-order bugs that only appeared at scale,
accuracy-parity-playbook.md). This runs an 8-layer / 512-dim / 128-token
forward in BOTH f32 and bf16 from the same weights and checks

  * margin-aware argmax agreement: wherever the f32 logits have a clear
    top-1 margin, bf16 must pick the same token (a pathological reduction
    bug flips confident predictions, not just ties);
  * bounded relative logit error.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.models import qwen3 as q3


@pytest.fixture(scope="module")
def midscale():
    cfg = q3.Qwen3Config(
        hidden_size=512, intermediate_size=1024, num_hidden_layers=8,
        num_attention_heads=8, num_key_value_heads=4, head_dim=64,
        vocab_size=2048, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=1024,
    )
    params32 = q3.init_random_params(cfg, seed=31, dtype=jnp.float32,
                                     scale=0.05)
    params16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params32)
    return cfg, params32, params16


def _all_logits(cfg, params, kv_dtype):
    T, ps = 128, 16
    kv = q3.make_kv_pages(cfg, num_pages=T // ps + 2, page_size=ps,
                          dtype=kv_dtype)
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(2, cfg.vocab_size, T), jnp.int32)
    table = jnp.asarray(np.arange(1, T // ps + 1, dtype=np.int32))
    _, _, logits = jax.jit(
        lambda p, k, t: q3.prefill(cfg, p, k, t, jnp.int32(T), table,
                                   return_all_logits=True)
    )(params, kv, toks)
    return np.asarray(logits, np.float32)


def test_bf16_margin_aware_argmax_and_error(midscale):
    cfg, params32, params16 = midscale
    l32 = _all_logits(cfg, params32, jnp.float32)
    l16 = _all_logits(cfg, params16, jnp.bfloat16)

    # relative error of the logits (bf16 has ~3 decimal digits; depth-8
    # accumulation should stay within a small multiple of that)
    denom = np.abs(l32).max()
    rel = np.abs(l16 - l32).max() / denom
    assert rel < 0.05, f"bf16 logit error blew up: {rel:.3f}"

    top2 = np.partition(l32, -2, axis=-1)[:, -2:]
    margin = top2[:, 1] - top2[:, 0]
    confident = margin > 0.05 * denom
    assert confident.sum() >= 32  # the check must actually bite
    a32 = l32.argmax(-1)
    a16 = l16.argmax(-1)
    disagree = (a32 != a16) & confident
    assert not disagree.any(), (
        f"bf16 flipped {disagree.sum()} confident argmaxes "
        f"(of {confident.sum()})"
    )


def test_bf16_batch_vs_sequential_midscale(midscale):
    """Batched decode == sequential decode at mid scale in bf16 (the
    reference's numerics invariant that forced row-sliced QKV GEMMs,
    batch_decode.rs:160-163) — exercised through the real engine."""
    from pegainfer_tpu.engine.contract import (
        EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
    )
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler

    cfg, _, params16 = midscale
    rng = np.random.default_rng(5)
    prompts = [rng.integers(2, cfg.vocab_size, 24).tolist() for _ in range(3)]

    def run(batched: bool):
        runtime = q3.make_runtime(cfg, params16, num_pages=64, page_size=16)
        engine = start_scheduler(JaxExecutor(
            runtime, EngineLoadOptions(max_batch_size=4 if batched else 1)))
        outs = []
        try:
            reqs = []
            for p in prompts:
                r = GenerateRequest(prompt_tokens=list(p), max_tokens=8,
                                    params=SamplingParams(ignore_eos=True))
                reqs.append(r)
            if batched:
                for r in reqs:
                    engine.submit(r)
            for r in reqs:
                if not batched:
                    engine.submit(r)
                toks = []
                for ev in r.channel:
                    if isinstance(ev, Token):
                        toks.append(ev.id)
                    elif isinstance(ev, Finished):
                        break
                outs.append(toks)
        finally:
            engine.shutdown()
        return outs

    assert run(True) == run(False)


# ── Flagship-DEPTH differentials (round 3, VERDICT r2 #9) ────────────────
# Reduction-order bugs compound with depth; these run the REAL layer counts
# (36 / 32 / 43) at narrow width so bf16-vs-f32 divergence has the full
# depth to show up in, CPU-feasibly. Width scaling is covered by the
# 512-dim case above; checkpoints for true-scale goldens remain
# unavailable in this environment (docs/ROADMAP.md #9).
#
# The hybrid and DSv4 architectures are INTRINSICALLY bf16-sensitive at
# depth (GDN exp recurrence, hyper-connection sinkhorn mixing, discrete
# top-k block selection): a HALF-ULP f32 weight perturbation already moves
# p90 logits ~5% at depth 32 (measured; the reference hit the same wall —
# its Qwen3.5 GSM8K 8-shot FAILS on long-prefill bf16 divergence,
# accuracy-eval-results.md:103). So those tests CALIBRATE: bf16-vs-f32
# divergence must stay within a small multiple of the model's own
# ulp-perturbation sensitivity — a reduction-order BUG adds error far
# beyond input conditioning; honest rounding does not.


def _margin_check(l32, l16, min_confident=16, rel_cap=0.08):
    denom = np.abs(l32).max()
    # p90 of per-position error: hybrid/sparse models have DISCRETE
    # bf16-sensitive choices (GDN exp recurrence, DSv4 top-k block
    # selection) that legitimately move a few positions' logits a lot —
    # the bulk must stay tight, and confident argmaxes must never flip
    per_pos = np.abs(l16 - l32).max(-1) / denom
    rel90 = np.quantile(per_pos, 0.9)
    assert rel90 < rel_cap, (
        f"bf16 logit error blew up: p90 {rel90:.3f} (max {per_pos.max():.3f})")
    top2 = np.partition(l32, -2, axis=-1)[..., -2:]
    margin = top2[..., 1] - top2[..., 0]
    confident = margin > 0.05 * denom
    assert confident.sum() >= min_confident
    disagree = (l32.argmax(-1) != l16.argmax(-1)) & confident
    assert not disagree.any(), (
        f"bf16 flipped {disagree.sum()} confident argmaxes")


def test_bf16_flagship_depth_qwen3():
    cfg = q3.Qwen3Config(
        hidden_size=256, intermediate_size=512, num_hidden_layers=36,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        vocab_size=2048, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=1024,
    )
    params32 = q3.init_random_params(cfg, seed=36, dtype=jnp.float32,
                                     scale=0.05)
    params16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params32)
    l32 = _all_logits(cfg, params32, jnp.float32)
    l16 = _all_logits(cfg, params16, jnp.bfloat16)
    _margin_check(l32, l16)


def _perturb_half_ulp(params, seed=99):
    rng = np.random.default_rng(seed)

    def pert(a):
        if a.dtype != jnp.float32:
            return a
        noise = jnp.asarray(rng.uniform(-1, 1, a.shape), jnp.float32)
        return a * (1 + noise * 2.0 ** -9)

    return jax.tree.map(pert, params)


def _calibrated_check(l32, l16, lp, cap_ratio=5.0):
    den = np.abs(l32).max()
    p_bf = np.quantile(np.abs(l16 - l32).max(-1) / den, 0.9)
    p_ulp = np.quantile(np.abs(lp - l32).max(-1) / den, 0.9)
    assert p_bf <= max(cap_ratio * p_ulp, 0.02), (
        f"bf16 divergence {p_bf:.4f} exceeds {cap_ratio}x the model's own "
        f"half-ulp sensitivity {p_ulp:.4f} — reduction-order bug territory")
    # confident-argmax agreement, margin scaled by the measured sensitivity
    top2 = np.partition(l32, -2, axis=-1)[..., -2:]
    margin = (top2[..., 1] - top2[..., 0]) / den
    confident = margin > 3 * max(p_bf, p_ulp)
    if confident.sum():
        disagree = (l32.argmax(-1) != l16.argmax(-1)) & confident
        assert not disagree.any(), (
            f"bf16 flipped {disagree.sum()} confident argmaxes")


def test_bf16_flagship_depth_qwen35():
    from pegainfer_tpu.models import qwen35 as q35

    cfg = q35.Qwen35Config(
        hidden_size=256, intermediate_size=512, num_hidden_layers=32,
        num_attention_heads=4, num_key_value_heads=2, head_dim=64,
        vocab_size=2048, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25,
        layer_types=("linear_attention",) * 3 + ("full_attention",),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=32, linear_value_head_dim=32,
        linear_conv_kernel_dim=4, tie_word_embeddings=True,
        eos_token_id=1, stop_token_ids=(1,), max_position_embeddings=1024,
    )
    params32 = q35.init_random_params(cfg, seed=32, dtype=jnp.float32,
                                      scale=0.05)
    params16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params32)

    T, ps = 64, 16
    rng = np.random.default_rng(7)
    toks = jnp.asarray(rng.integers(2, cfg.vocab_size, T), jnp.int32)
    table = jnp.asarray(np.arange(1, T // ps + 1, dtype=np.int32))

    def logits(params, kv_dtype):
        state = q35.make_state(cfg, num_pages=T // ps + 2, page_size=ps,
                               max_slots=1, kv_dtype=kv_dtype)
        _, _, all_l = jax.jit(
            lambda p, s, t: q35.prefill(cfg, p, s, t, jnp.int32(T), table,
                                        jnp.int32(0), return_all_logits=True)
        )(params, state, toks)
        return np.asarray(all_l, np.float32)

    _calibrated_check(logits(params32, jnp.float32),
                      logits(params16, jnp.bfloat16),
                      logits(_perturb_half_ulp(params32), jnp.float32))


def test_bf16_flagship_depth_dsv4():
    from pegainfer_tpu.models import dsv4

    ratios = ((0,) + (8, 4, 0) * 14)  # 43 layers, the flagship count
    cfg = dsv4.DSv4Config(
        vocab_size=512, dim=64, moe_inter_dim=32, n_layers=43,
        num_attention_heads=4, head_dim=16, q_lora_rank=32,
        qk_rope_head_dim=8, o_groups=4, o_lora_rank=8, sliding_window=16,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=4, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=4, index_head_dim=16, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=ratios, yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params32 = dsv4.init_random_params(cfg, seed=43, dtype=jnp.float32,
                                       scale=0.05)
    params16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params32)
    toks = jnp.asarray(
        np.random.default_rng(9).integers(2, cfg.vocab_size, 32), jnp.int32)
    fwd = jax.jit(lambda p, t: dsv4.prefill(cfg, p, t)[0])
    l32 = np.asarray(fwd(params32, toks), np.float32)
    l16 = np.asarray(fwd(params16, toks), np.float32)
    lp = np.asarray(fwd(_perturb_half_ulp(params32), toks), np.float32)
    _calibrated_check(l32, l16, lp)
