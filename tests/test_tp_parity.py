"""TP sharding parity: greedy tokens must match TP=1 bit-for-bit decisions.

The reference fought bf16 reduction-order drift across sharding
(batch_decode.rs:160-163, accuracy-parity-playbook.md); under GSPMD the
projection math is identical per shard and psum order is deterministic, so
we require token-exact parity on the virtual CPU mesh (f32 weights).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.engine.kv import KvState, PagePool
from pegainfer_tpu.models import qwen3 as q3
from pegainfer_tpu.ops.sampling import sample_greedy
from pegainfer_tpu.parallel.sharding import MeshConfig, make_mesh, shard_qwen3

PAGE_SIZE = 4


@pytest.fixture(scope="module")
def setup():
    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=16,
        vocab_size=256, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=False, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=11, dtype=jnp.float32)
    return cfg, params


def greedy_run(cfg, params, kv, prompt, n_new):
    pool = PagePool(64)
    st = KvState(page_size=PAGE_SIZE)
    T = len(prompt)
    Tp = -(-T // PAGE_SIZE) * PAGE_SIZE
    st.ensure_capacity(pool, T)
    table = np.full(Tp // PAGE_SIZE, PagePool.NULL_PAGE, np.int32)
    table[: len(st.pages)] = st.pages
    toks = np.zeros(Tp, np.int32)
    toks[:T] = prompt
    pf = jax.jit(lambda p, k, t, sl, pt: q3.prefill(cfg, p, k, t, sl, pt))
    dc = jax.jit(lambda p, k, t, po, pt, sl: q3.decode(cfg, p, k, t, po, pt, sl))
    kv, last, _ = pf(params, kv, jnp.asarray(toks), jnp.int32(T), jnp.asarray(table))
    out = [int(np.asarray(sample_greedy(jnp.asarray(last)[None]))[0])]
    P = 16
    for _ in range(n_new - 1):
        pos = st.length
        st.ensure_capacity(pool, pos + 1)
        st.advance(1)
        tables = np.full((1, P), PagePool.NULL_PAGE, np.int32)
        tables[0, : len(st.pages)] = st.pages
        kv, logits = dc(
            params, kv, jnp.asarray([out[-1]], jnp.int32),
            jnp.asarray([pos], jnp.int32), jnp.asarray(tables),
            jnp.asarray([pos + 1], jnp.int32),
        )
        out.append(int(np.asarray(sample_greedy(logits))[0]))
    return out


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_greedy_token_parity(setup, tp):
    cfg, params = setup
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 255, 10).tolist()

    kv1 = q3.make_kv_pages(cfg, 64, PAGE_SIZE, dtype=jnp.float32)
    base = greedy_run(cfg, params, kv1, prompt, 10)

    mesh = make_mesh(MeshConfig(dp=1, tp=tp))
    kvN = q3.make_kv_pages(cfg, 64, PAGE_SIZE, dtype=jnp.float32)
    paramsN, kvN = shard_qwen3(mesh, cfg, params, kvN)
    sharded = greedy_run(cfg, paramsN, kvN, prompt, 10)

    assert base == sharded


def test_dp_tp_mesh_batch_decode(setup):
    """2x4 mesh: replicated-batch decode executes and matches tp-only."""
    cfg, params = setup
    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    kv = q3.make_kv_pages(cfg, 64, PAGE_SIZE, dtype=jnp.float32)
    paramsN, kvN = shard_qwen3(mesh, cfg, params, kv)
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 255, 6).tolist()
    out = greedy_run(cfg, paramsN, kvN, prompt, 6)
    kv1 = q3.make_kv_pages(cfg, 64, PAGE_SIZE, dtype=jnp.float32)
    base = greedy_run(cfg, params, kv1, prompt, 6)
    assert out == base
