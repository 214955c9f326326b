"""Qwen3.5 hybrid numerics parity vs HF Qwen3NextForCausalLM (torch CPU).

Same oracle strategy as test_qwen3_parity: tiny random-initialized config in
f32, logits + greedy-token match through the full paged-KV + slot-state
prefill/decode path (reference harness: qwen35-4b/tests/e2e.rs vs
test_data/Qwen3.5-4B.json).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pegainfer_tpu.engine.kv import KvState, PagePool
from pegainfer_tpu.models import qwen35 as q35
from pegainfer_tpu.ops.sampling import sample_greedy

PAGE_SIZE = 4
MAX_SLOTS = 4
CHUNK = 16


@pytest.fixture(scope="module")
def tiny():
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    hf_cfg = Qwen3NextConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        partial_rotary_factor=0.25,
        tie_word_embeddings=True,
        max_position_embeddings=512,
        layer_types=["linear_attention", "full_attention"] * 2,
        linear_num_key_heads=2,
        linear_num_value_heads=4,
        linear_key_head_dim=16,
        linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        num_experts=0,  # dense MLP (Qwen3.5-4B is dense)
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3NextForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = q35.Qwen35Config.from_hf(hf_cfg)
    params = q35.params_from_state_dict(cfg, sd, dtype=jnp.float32)

    jitted = {
        "prefill": jax.jit(
            lambda s, t, sl, pt, slot: q35.prefill(
                cfg, params, s, t, sl, pt, slot, gdn_chunk_size=CHUNK
            )
        ),
        "prefill_all": jax.jit(
            lambda s, t, sl, pt, slot: q35.prefill(
                cfg, params, s, t, sl, pt, slot, return_all_logits=True,
                gdn_chunk_size=CHUNK,
            )
        ),
        "decode": jax.jit(
            lambda s, t, p, pt, sl, slots: q35.decode(cfg, params, s, t, p, pt, sl, slots)
        ),
    }
    return hf_cfg, model, cfg, params, jitted


def hf_logits(model, tokens):
    with torch.no_grad():
        out = model(torch.tensor([tokens], dtype=torch.long))
    return out.logits[0].float().numpy()


def run_prefill(cfg, jitted, tokens, num_pages=64, slot=0, return_all=False,
                state=None, pool=None):
    if state is None:
        state = q35.make_state(cfg, num_pages, PAGE_SIZE, MAX_SLOTS, kv_dtype=jnp.float32)
    if pool is None:
        pool = PagePool(num_pages)
    st = KvState(page_size=PAGE_SIZE)
    T = len(tokens)
    Tp = -(-T // CHUNK) * CHUNK
    st.ensure_capacity(pool, T)
    table = np.full(Tp // PAGE_SIZE, PagePool.NULL_PAGE, dtype=np.int32)
    table[: len(st.pages)] = st.pages
    toks = np.zeros(Tp, dtype=np.int32)
    toks[:T] = tokens
    fn = jitted["prefill_all"] if return_all else jitted["prefill"]
    state, last_logits, all_logits = fn(
        state, jnp.asarray(toks), jnp.int32(T), jnp.asarray(table), jnp.int32(slot)
    )
    return state, st, pool, last_logits, all_logits


def test_prefill_logits_match_hf(tiny):
    _, model, cfg, _, jitted = tiny
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 255, size=11).tolist()
    ref = hf_logits(model, tokens)
    _, _, _, last, all_logits = run_prefill(cfg, jitted, tokens, return_all=True)
    np.testing.assert_allclose(
        np.asarray(all_logits)[: len(tokens)], ref, rtol=0, atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(last), ref[-1], rtol=0, atol=5e-3)


def greedy_generate_ours(cfg, jitted, prompt, n_new, slot=0, batch_pad=1):
    state, st, pool, last_logits, _ = run_prefill(cfg, jitted, prompt, slot=slot)
    out = [int(np.asarray(sample_greedy(jnp.asarray(last_logits)[None, :]))[0])]
    P = 16
    for _ in range(n_new - 1):
        pos = st.length
        st.ensure_capacity(pool, pos + 1)
        st.advance(1)
        B = batch_pad
        tokens = np.zeros(B, dtype=np.int32)
        positions = np.zeros(B, dtype=np.int32)
        seq_lens = np.zeros(B, dtype=np.int32)
        slots = np.full(B, MAX_SLOTS, dtype=np.int32)
        tables = np.full((B, P), PagePool.NULL_PAGE, dtype=np.int32)
        tokens[0] = out[-1]
        positions[0] = pos
        seq_lens[0] = pos + 1
        slots[0] = slot
        tables[0, : len(st.pages)] = st.pages
        state, logits = jitted["decode"](
            state, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(tables), jnp.asarray(seq_lens), jnp.asarray(slots),
        )
        out.append(int(np.asarray(sample_greedy(logits))[0]))
    return out


def test_greedy_tokens_match_hf(tiny):
    _, model, cfg, _, jitted = tiny
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 255, size=9).tolist()
    n_new = 10
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt], dtype=torch.long),
            max_new_tokens=n_new,
            do_sample=False,
            use_cache=True,
            pad_token_id=0,
        )[0][len(prompt):].tolist()
    ours = greedy_generate_ours(cfg, jitted, prompt, n_new)
    assert ours == ref


def test_decode_batch_padding_parity(tiny):
    """Padded batch rows (dead slot + null page) must not perturb row 0."""
    _, _, cfg, _, jitted = tiny
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 255, size=6).tolist()
    a = greedy_generate_ours(cfg, jitted, prompt, 6, batch_pad=1)
    b = greedy_generate_ours(cfg, jitted, prompt, 6, batch_pad=4)
    assert a == b


def test_fused_layout_matches_split():
    """fuse_params (single-GEMM projections) is numerically identical to
    the split layout — column-slicing a fused GEMM computes the same dot
    products."""
    import numpy as np

    cfg = q35.Qwen35Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        partial_rotary_factor=0.25,
        layer_types=("linear_attention",) * 3 + ("full_attention",),
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, tie_word_embeddings=True,
        eos_token_id=1, stop_token_ids=(1,), max_position_embeddings=512,
    )
    params = q35.init_bench_params(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    for grp in ("lin", "full"):
        for k, v in params[grp].items():
            params[grp][k] = jnp.asarray(
                rng.standard_normal(v.shape) * 0.05, v.dtype)
    fused = q35.fuse_params(jax.tree.map(lambda a: a, params))

    toks = jnp.asarray(np.arange(8) + 3, jnp.int32)
    table = jnp.asarray([1, 2], jnp.int32)
    s1 = q35.make_state(cfg, 16, 4, max_slots=2, kv_dtype=jnp.float32)
    s2 = q35.make_state(cfg, 16, 4, max_slots=2, kv_dtype=jnp.float32)
    _, l1, _ = q35.prefill(cfg, params, s1, toks, jnp.int32(8), table, jnp.int32(0))
    _, l2, _ = q35.prefill(cfg, fused, s2, toks, jnp.int32(8), table, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)
