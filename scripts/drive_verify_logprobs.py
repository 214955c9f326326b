"""Drive: fused-logprobs async decode + non-chunkable prefill interleave,
end-to-end (scheduler + JaxExecutor) on the real TPU.

Run: python scripts/drive_verify_logprobs.py
"""
import faulthandler
import math
import sys
import time

faulthandler.dump_traceback_later(600, exit=True)

import numpy as np
import jax
import jax.numpy as jnp

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

from pegainfer_tpu.engine.contract import (
    Finished, GenerateRequest, PromptTokens, SamplingParams, Token,
    TokenChannel, is_terminal,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen3 as q3

print("backend:", jax.default_backend(), flush=True)

cfg = q3.Qwen3Config(
    vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=1, head_dim=16,
    rms_norm_eps=1e-6, rope_theta=1e6, tie_word_embeddings=True,
    max_position_embeddings=256, eos_token_id=7, stop_token_ids=(7,),
)
rng = np.random.default_rng(0)


def t(*shape):
    return (rng.standard_normal(shape) * 0.05).astype(np.float32)


sd = {"model.embed_tokens.weight": t(cfg.vocab_size, cfg.hidden_size),
      "model.norm.weight": np.ones(cfg.hidden_size, np.float32)}
for i in range(cfg.num_hidden_layers):
    p = f"model.layers.{i}."
    hd = cfg.head_dim
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    sd.update({
        p + "self_attn.q_proj.weight": t(nh * hd, cfg.hidden_size),
        p + "self_attn.k_proj.weight": t(nkv * hd, cfg.hidden_size),
        p + "self_attn.v_proj.weight": t(nkv * hd, cfg.hidden_size),
        p + "self_attn.o_proj.weight": t(cfg.hidden_size, nh * hd),
        p + "self_attn.q_norm.weight": np.ones(hd, np.float32),
        p + "self_attn.k_norm.weight": np.ones(hd, np.float32),
        p + "input_layernorm.weight": np.ones(cfg.hidden_size, np.float32),
        p + "post_attention_layernorm.weight": np.ones(cfg.hidden_size, np.float32),
        p + "mlp.gate_proj.weight": t(cfg.intermediate_size, cfg.hidden_size),
        p + "mlp.up_proj.weight": t(cfg.intermediate_size, cfg.hidden_size),
        p + "mlp.down_proj.weight": t(cfg.hidden_size, cfg.intermediate_size),
    })
params = q3.params_from_state_dict(cfg, sd, dtype=jnp.float32)

rt = q3.make_runtime(cfg, params, num_pages=128, page_size=4, kv_dtype=jnp.float32)
ex = JaxExecutor(rt)
handle = start_scheduler(ex)


def submit(prompt, max_tokens, **kw):
    ch = TokenChannel()
    handle.submit(GenerateRequest(prompt_tokens=prompt, max_tokens=max_tokens,
                                  channel=ch, **kw))
    return ch


def collect(ch):
    toks, fin, pe = [], None, None
    for ev in ch:
        if isinstance(ev, Token):
            toks.append(ev)
        elif isinstance(ev, PromptTokens):
            pe = ev
        if is_terminal(ev):
            fin = ev
            break
    return toks, fin, pe


t0 = time.time()
# 1) logprobs request + plain request CONCURRENT -> batch rides the fused
#    async path with lp_k>0 (previously this dropped to the unfused path)
ch_lp = submit([9, 23, 41, 88], 12, params=SamplingParams(ignore_eos=True), logprobs=3)
ch_plain = submit([14, 55, 71], 12, params=SamplingParams(ignore_eos=True))
toks_lp, fin_lp, _ = collect(ch_lp)
toks_plain, fin_plain, _ = collect(ch_plain)
assert len(toks_lp) == 12 and len(toks_plain) == 12, (len(toks_lp), len(toks_plain))
assert all(t.logprob is not None for t in toks_lp), "logprobs missing on fused path"
assert all(t.logprob is None for t in toks_plain)
for t in toks_lp:
    assert len(t.logprob.top_logprobs) == 3
    assert t.logprob.logprob <= 0.0 + 1e-6
    best = max(v for _, v in t.logprob.top_logprobs)
    assert t.logprob.logprob <= best + 1e-4
    # greedy: chosen token is the argmax -> the top-1 entry
    assert t.logprob.top_logprobs[0][0] == t.id
print("phase 1 OK: fused async logprobs, %d toks, first lp=%.4f (%.1fs)"
      % (len(toks_lp), toks_lp[0].logprob.logprob, time.time() - t0), flush=True)

# cross-check fused-path logprob values vs the unfused (solo logprobs) path
ch_solo = submit([9, 23, 41, 88], 12, params=SamplingParams(ignore_eos=True), logprobs=3)
toks_solo, _, _ = collect(ch_solo)
assert [t.id for t in toks_solo] == [t.id for t in toks_lp]
for a, b in zip(toks_solo, toks_lp):
    assert math.isclose(a.logprob.logprob, b.logprob.logprob, abs_tol=2e-3), \
        (a.logprob.logprob, b.logprob.logprob)
print("phase 2 OK: fused logprob values match solo-run values", flush=True)

# 3) echo+logprobs (non-chunkable prefill) submitted while another request
#    decodes -> takes the run-alone + decode-block interleave path
ch_bg = submit([3, 5], 40, params=SamplingParams(ignore_eos=True))
time.sleep(0.3)
ch_echo = submit(list(range(10, 40)), 4, params=SamplingParams(ignore_eos=True),
                 logprobs=2, echo=True)
toks_e, fin_e, pe = collect(ch_echo)
toks_bg, fin_bg, _ = collect(ch_bg)
assert pe is not None and len(pe.logprobs) == 30 and pe.logprobs[0] is None
assert all(lp is not None for lp in pe.logprobs[1:])
assert len(toks_e) == 4 and all(t.logprob is not None for t in toks_e)
assert len(toks_bg) == 40
print("phase 3 OK: echo+logprobs prefill alongside active decode", flush=True)

handle.shutdown()
print("DRIVE PASSED in %.1fs" % (time.time() - t0), flush=True)
