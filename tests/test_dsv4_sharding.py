"""DSv4 MP8 sharding on the virtual 8-device mesh: sharded == unsharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.models import dsv4
from pegainfer_tpu.parallel.sharding import MeshConfig, make_mesh, shard_dsv4


@pytest.fixture(scope="module")
def tiny8():
    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=32, moe_inter_dim=16, n_layers=2,
        num_attention_heads=8, head_dim=16, q_lora_rank=16,
        qk_rope_head_dim=8, o_groups=8, o_lora_rank=4, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=0, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=16, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4), yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.init_random_params(cfg, seed=3, dtype=jnp.float32, scale=0.08)
    return cfg, params


def test_mp8_prefill_decode_parity(tiny8):
    cfg, params = tiny8
    rng = np.random.default_rng(4)
    toks = rng.integers(2, 128, 9)

    # unsharded
    state = dsv4.make_state(cfg, max_slots=1, max_blocks=8)
    logits, state = dsv4.prefill(cfg, params, jnp.asarray(toks[:8], jnp.int32),
                                 state=state, slot=jnp.int32(0))
    s1, l1 = dsv4.decode(cfg, params, state, jnp.asarray([toks[8]], jnp.int32),
                         jnp.asarray([8], jnp.int32), jnp.asarray([0], jnp.int32))

    # mp8-sharded
    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    state8 = dsv4.make_state(cfg, max_slots=1, max_blocks=8)
    params8, state8 = shard_dsv4(mesh, params, state8)
    logits8, state8 = dsv4.prefill(cfg, params8, jnp.asarray(toks[:8], jnp.int32),
                                   state=state8, slot=jnp.int32(0))
    s8, l8 = dsv4.decode(cfg, params8, state8, jnp.asarray([toks[8]], jnp.int32),
                         jnp.asarray([8], jnp.int32), jnp.asarray([0], jnp.int32))

    np.testing.assert_allclose(np.asarray(logits[-1]), np.asarray(logits8[-1]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), rtol=5e-4, atol=5e-4)
    assert int(jnp.argmax(l1[0])) == int(jnp.argmax(l8[0]))
