"""DSv4 segment-scanned decode == unrolled decode (identical math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.models import dsv4


@pytest.fixture(scope="module")
def setup():
    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=32, moe_inter_dim=16, n_layers=5,
        num_attention_heads=4, head_dim=16, q_lora_rank=16,
        qk_rope_head_dim=8, o_groups=2, o_lora_rank=4, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=2, index_head_dim=8, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4, 4, 8, 8),  # runs: [0], [4,4], [8,8]
        yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.init_random_params(cfg, seed=4, dtype=jnp.float32, scale=0.08)
    return cfg, params


def test_segments(setup):
    cfg, _ = setup
    segs = dsv4.segments(cfg)
    # hash split also breaks the first run? layer0 is hash → own segment
    assert segs[0] == (0, 1, 0, True)
    assert (1, 3, 4, False) in segs
    assert (3, 5, 8, False) in segs


def test_grouped_decode_matches_unrolled(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    toks = rng.integers(2, 128, 9)

    state = dsv4.make_state(cfg, max_slots=2, max_blocks=8)
    _, state = dsv4.prefill(cfg, params, jnp.asarray(toks[:8], jnp.int32),
                            state=state, slot=jnp.int32(0))

    gparams = dsv4.group_params(cfg, params)
    gstate = dsv4.group_state(cfg, state)

    args = (jnp.asarray([toks[8]], jnp.int32), jnp.asarray([8], jnp.int32),
            jnp.asarray([0], jnp.int32))
    s1, l1 = dsv4.decode(cfg, params, state, *args)
    gs, l2 = dsv4.decode_grouped(cfg, gparams, gstate, *args)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-5, atol=2e-5)

    # state round-trips: another step from each representation agrees
    s2 = dsv4.ungroup_state(cfg, gs)
    args2 = (jnp.asarray([5], jnp.int32), jnp.asarray([9], jnp.int32),
             jnp.asarray([0], jnp.int32))
    _, l3 = dsv4.decode(cfg, params, s1, *args2)
    _, l4 = dsv4.decode(cfg, params, s2, *args2)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l4), rtol=2e-5, atol=2e-5)


def test_grouped_jit_compiles_fewer_layers(setup):
    cfg, params = setup
    gparams = dsv4.group_params(cfg, params)
    state = dsv4.make_state(cfg, max_slots=1, max_blocks=8)
    gstate = dsv4.group_state(cfg, state)
    f = jax.jit(lambda gp, gs, t, p, sl: dsv4.decode_grouped(cfg, gp, gs, t, p, sl))
    gs2, logits = f(gparams, gstate,
                    jnp.asarray([3], jnp.int32), jnp.asarray([0], jnp.int32),
                    jnp.asarray([0], jnp.int32))
    assert logits.shape == (1, 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_grouped_prefill_and_decode_chain(setup):
    """Grouped prefill seeds grouped state; grouped decode then matches the
    unrolled chain end to end."""
    cfg, params = setup
    rng = np.random.default_rng(5)
    toks = rng.integers(2, 128, 11)

    # unrolled chain
    state = dsv4.make_state(cfg, max_slots=2, max_blocks=8)
    lg_u, state = dsv4.prefill(cfg, params, jnp.asarray(toks[:10], jnp.int32),
                               state=state, slot=jnp.int32(1))
    s_u, d_u = dsv4.decode(cfg, params, state,
                           jnp.asarray([toks[10]], jnp.int32),
                           jnp.asarray([10], jnp.int32),
                           jnp.asarray([1], jnp.int32))

    # grouped chain
    gparams = dsv4.group_params(cfg, params)
    gstate = dsv4.group_state(cfg, dsv4.make_state(cfg, max_slots=2, max_blocks=8))
    lg_g, gstate = dsv4.prefill_grouped(cfg, gparams,
                                        jnp.asarray(toks[:10], jnp.int32),
                                        gstate=gstate, slot=jnp.int32(1))
    gs, d_g = dsv4.decode_grouped(cfg, gparams, gstate,
                                  jnp.asarray([toks[10]], jnp.int32),
                                  jnp.asarray([10], jnp.int32),
                                  jnp.asarray([1], jnp.int32))

    np.testing.assert_allclose(np.asarray(lg_u[-1]), np.asarray(lg_g[-1]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_u), np.asarray(d_g),
                               rtol=2e-5, atol=2e-5)
