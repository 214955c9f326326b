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
