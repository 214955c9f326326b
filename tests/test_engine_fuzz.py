"""Engine protocol fuzz: random arrivals, receiver drops, mixed sampling.

Invariants asserted (the reference pins these across e2e.rs phases):
- every surviving request gets exactly one terminal event;
- token counts never exceed max_tokens;
- dropped receivers never wedge the engine;
- the engine still serves correctly after the storm.
"""

import random
import threading

import numpy as np
import pytest

import jax.numpy as jnp

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions,
    Error,
    Finished,
    GenerateRequest,
    Rejected,
    SamplingParams,
    Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen3 as q3


def test_fuzz_storm_then_clean_request():
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=13, dtype=jnp.float32)
    runtime = q3.make_runtime(cfg, params, num_pages=96, page_size=4,
                              kv_dtype=jnp.float32)
    runtime.max_slots = 6
    handle = start_scheduler(
        JaxExecutor(runtime, EngineLoadOptions(max_batch_size=4, prefill_chunk=16))
    )
    rng = random.Random(0)
    nprng = np.random.default_rng(0)
    outcomes = {}

    def run(i):
        plen = rng.choice([1, 3, 7, 20, 40])
        max_tokens = rng.choice([1, 2, 5, 12])
        if rng.random() < 0.3:
            params_ = SamplingParams(temperature=0.9, top_k=20,
                                     ignore_eos=rng.random() < 0.5)
        else:
            params_ = SamplingParams(ignore_eos=rng.random() < 0.5)
        req = GenerateRequest(
            prompt_tokens=nprng.integers(2, 128, plen).tolist(),
            max_tokens=max_tokens, params=params_,
        )
        handle.submit(req)
        drop_after = rng.choice([None, None, None, 1, 3])
        toks = 0
        terminal = 0
        for ev in req.channel:
            if isinstance(ev, Token):
                toks += 1
                if drop_after is not None and toks >= drop_after:
                    req.channel.close()
                    outcomes[i] = ("dropped", toks)
                    return
            elif isinstance(ev, (Finished, Error, Rejected)):
                terminal += 1
        outcomes[i] = ("done", toks, terminal)
        assert toks <= max_tokens
        assert terminal == 1

    try:
        threads = [threading.Thread(target=run, args=(i,)) for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert len(outcomes) == 24, f"wedged: only {len(outcomes)}/24 finished"

        # engine must still serve deterministically after the storm
        a = GenerateRequest(prompt_tokens=[5, 6, 7], max_tokens=6,
                            params=SamplingParams(ignore_eos=True))
        handle.submit(a)
        toks_a = [ev.id for ev in a.channel if isinstance(ev, Token)]
        b = GenerateRequest(prompt_tokens=[5, 6, 7], max_tokens=6,
                            params=SamplingParams(ignore_eos=True))
        handle.submit(b)
        toks_b = [ev.id for ev in b.channel if isinstance(ev, Token)]
        assert toks_a == toks_b
        assert len(toks_a) == 6
    finally:
        handle.shutdown()
