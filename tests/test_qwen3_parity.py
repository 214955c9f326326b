"""Qwen3 numerics parity vs HF transformers (torch CPU oracle).

Stand-in for the reference's golden-token harness
(test_data/Qwen3-4B.json vs HF greedy output, SURVEY.md §4): no checkpoint is
available in this environment, so we verify against the HF *implementation*
with a tiny random-initialized config in f32 — logits match and greedy
token-exact match through the full paged-KV prefill+decode path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from pegainfer_tpu.engine.kv import PagePool, KvState
from pegainfer_tpu.models import qwen3 as q3
from pegainfer_tpu.ops.sampling import sample_greedy

PAGE_SIZE = 4


def make_jitted(cfg, params):
    """jit once per shape (jax caches on shapes); closures over params."""
    pf = jax.jit(
        lambda kv, t, sl, pt: q3.prefill(cfg, params, kv, t, sl, pt),
    )
    pf_all = jax.jit(
        lambda kv, t, sl, pt: q3.prefill(cfg, params, kv, t, sl, pt, return_all_logits=True),
    )
    dc = jax.jit(lambda kv, t, p, pt, sl: q3.decode(cfg, params, kv, t, p, pt, sl))
    return {"prefill": pf, "prefill_all": pf_all, "decode": dc}


@pytest.fixture(scope="module")
def tiny():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        tie_word_embeddings=True,
        max_position_embeddings=512,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = q3.Qwen3Config.from_hf(hf_cfg)
    params = q3.params_from_state_dict(cfg, sd, dtype=jnp.float32)
    return hf_cfg, model, cfg, params, make_jitted(cfg, params)


def hf_logits(model, tokens):
    with torch.no_grad():
        out = model(torch.tensor([tokens], dtype=torch.long))
    return out.logits[0].float().numpy()


def run_prefill(cfg, params, jitted, tokens, num_pages=64, pad_to=None, return_all=False):
    kv = q3.make_kv_pages(cfg, num_pages, PAGE_SIZE, dtype=jnp.float32)
    pool = PagePool(num_pages)
    st = KvState(page_size=PAGE_SIZE)
    T = len(tokens)
    Tp = pad_to or T
    st.ensure_capacity(pool, T)
    table_len = Tp // PAGE_SIZE if Tp % PAGE_SIZE == 0 else (Tp // PAGE_SIZE + 1)
    Tp = table_len * PAGE_SIZE
    table = np.full(table_len, PagePool.NULL_PAGE, dtype=np.int32)
    table[: len(st.pages)] = st.pages
    toks = np.zeros(Tp, dtype=np.int32)
    toks[:T] = tokens
    fn = jitted["prefill_all"] if return_all else jitted["prefill"]
    kv, last_logits, all_logits = fn(
        kv, jnp.asarray(toks), jnp.int32(T), jnp.asarray(table)
    )
    return kv, st, pool, last_logits, all_logits


def test_prefill_logits_match_hf(tiny):
    _, model, cfg, params, jitted = tiny
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 255, size=9).tolist()
    ref = hf_logits(model, tokens)
    _, _, _, last_logits, all_logits = run_prefill(cfg, params, jitted, tokens, return_all=True)
    ours = np.asarray(all_logits)[: len(tokens)]
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(last_logits), ref[-1], rtol=0, atol=5e-3)


def test_prefill_padding_does_not_change_logits(tiny):
    _, _, cfg, params, jitted = tiny
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 255, size=7).tolist()
    _, _, _, a, _ = run_prefill(cfg, params, jitted, tokens)
    _, _, _, b, _ = run_prefill(cfg, params, jitted, tokens, pad_to=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def greedy_generate_ours(cfg, params, jitted, prompt, n_new, num_pages=64, batch_pad=1):
    """Prefill + paged decode loop, optionally padding the batch with null rows."""
    kv, st, pool, last_logits, _ = run_prefill(cfg, params, jitted, prompt, num_pages)
    out = [int(np.asarray(sample_greedy(jnp.asarray(last_logits)[None, :]))[0])]
    P = 16  # page-table width (static)
    for _ in range(n_new - 1):
        pos = st.length  # write position of the fed-back token
        st.ensure_capacity(pool, pos + 1)
        st.advance(1)
        B = batch_pad
        tokens = np.zeros(B, dtype=np.int32)
        positions = np.zeros(B, dtype=np.int32)
        seq_lens = np.zeros(B, dtype=np.int32)
        tables = np.full((B, P), PagePool.NULL_PAGE, dtype=np.int32)
        tokens[0] = out[-1]
        positions[0] = pos
        seq_lens[0] = pos + 1
        tables[0, : len(st.pages)] = st.pages
        kv, logits = jitted["decode"](
            kv,
            jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(tables), jnp.asarray(seq_lens),
        )
        out.append(int(np.asarray(sample_greedy(logits))[0]))
    return out


def test_greedy_tokens_match_hf(tiny):
    _, model, cfg, params, jitted = tiny
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 255, size=11).tolist()
    n_new = 12
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt], dtype=torch.long),
            max_new_tokens=n_new,
            do_sample=False,
            use_cache=True,
            pad_token_id=0,
        )[0][len(prompt):].tolist()
    ours = greedy_generate_ours(cfg, params, jitted, prompt, n_new)
    assert ours == ref


def test_decode_batch_padding_parity(tiny):
    """Padded batch rows (null page) must not perturb row 0 — the reference's
    batch-vs-sequential numerics invariant (batch_decode.rs:505-606)."""
    _, _, cfg, params, jitted = tiny
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 255, size=6).tolist()
    a = greedy_generate_ours(cfg, params, jitted, prompt, 8, batch_pad=1)
    b = greedy_generate_ours(cfg, params, jitted, prompt, 8, batch_pad=4)
    assert a == b
