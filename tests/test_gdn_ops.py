"""Gated Delta Net ops vs the HF torch reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from transformers.models.qwen3_next.modeling_qwen3_next import (  # noqa: E402
    torch_causal_conv1d_update,
    torch_chunk_gated_delta_rule,
    torch_recurrent_gated_delta_rule,
)

from pegainfer_tpu.ops import gdn  # noqa: E402


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("T,H,dk,dv,chunk", [(128, 2, 16, 32, 64), (64, 1, 8, 8, 16)])
def test_gdn_chunk_matches_hf(T, H, dk, dv, chunk):
    rng = np.random.default_rng(0)
    q = _rand(rng, T, H, dk)
    k = _rand(rng, T, H, dk)
    v = _rand(rng, T, H, dv)
    g = -np.abs(_rand(rng, T, H)) * 0.1
    beta = 1 / (1 + np.exp(-_rand(rng, T, H)))

    # HF expects [B, T, H, d]
    tq, tk, tv = (torch.tensor(x[None]) for x in (q, k, v))
    tg, tb = torch.tensor(g[None]), torch.tensor(beta[None])
    ref_out, ref_state = torch_chunk_gated_delta_rule(
        tq, tk, tv, tg, tb, chunk_size=chunk, initial_state=None,
        output_final_state=True, use_qk_l2norm_in_kernel=True,
    )

    out, state = gdn.gdn_chunk(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
        jnp.asarray(beta), jnp.zeros((H, dk, dv), jnp.float32), chunk=chunk,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out[0].numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state), ref_state[0].numpy(), rtol=2e-4, atol=2e-4)


def test_gdn_step_matches_hf_recurrent():
    rng = np.random.default_rng(1)
    B, H, dk, dv, T = 2, 3, 16, 8, 5
    q = _rand(rng, B, T, H, dk)
    k = _rand(rng, B, T, H, dk)
    v = _rand(rng, B, T, H, dv)
    g = -np.abs(_rand(rng, B, T, H)) * 0.2
    beta = 1 / (1 + np.exp(-_rand(rng, B, T, H)))

    ref_out, ref_state = torch_recurrent_gated_delta_rule(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), torch.tensor(g),
        torch.tensor(beta), initial_state=None, output_final_state=True,
        use_qk_l2norm_in_kernel=True,
    )

    state = jnp.zeros((B, H, dk, dv), jnp.float32)
    outs = []
    for t in range(T):
        o, state = gdn.gdn_step(
            jnp.asarray(q[:, t]), jnp.asarray(k[:, t]), jnp.asarray(v[:, t]),
            jnp.asarray(g[:, t]), jnp.asarray(beta[:, t]), state,
        )
        outs.append(np.asarray(o))
    out = np.stack(outs, axis=1)
    np.testing.assert_allclose(out, ref_out.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state), ref_state.numpy(), rtol=1e-4, atol=1e-4)


def test_chunk_vs_step_equivalence_with_padding():
    """Chunked prefill == sequential steps; padded rows (g=0, beta=0) are
    state no-ops."""
    rng = np.random.default_rng(2)
    T, pad_T, H, dk, dv = 37, 64, 2, 8, 8
    q = _rand(rng, pad_T, H, dk)
    k = _rand(rng, pad_T, H, dk)
    v = _rand(rng, pad_T, H, dv)
    g = -np.abs(_rand(rng, pad_T, H)) * 0.1
    beta = 1 / (1 + np.exp(-_rand(rng, pad_T, H)))
    valid = (np.arange(pad_T) < T)[:, None]
    g_m = np.where(valid, g, 0.0).astype(np.float32)
    b_m = np.where(valid, beta, 0.0).astype(np.float32)

    out_c, state_c = gdn.gdn_chunk(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g_m),
        jnp.asarray(b_m), jnp.zeros((H, dk, dv), jnp.float32), chunk=16,
    )

    state = jnp.zeros((1, H, dk, dv), jnp.float32)
    outs = []
    for t in range(T):
        o, state = gdn.gdn_step(
            jnp.asarray(q[None, t]), jnp.asarray(k[None, t]), jnp.asarray(v[None, t]),
            jnp.asarray(g[None, t]), jnp.asarray(beta[None, t]), state,
        )
        outs.append(np.asarray(o[0]))
    np.testing.assert_allclose(
        np.asarray(out_c[:T]), np.stack(outs), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(state_c), np.asarray(state[0]), rtol=5e-4, atol=5e-4)


def test_conv1d_prefill_matches_torch():
    rng = np.random.default_rng(3)
    T, C, K = 12, 6, 4
    x = _rand(rng, T, C)
    w = _rand(rng, C, K)
    tx = torch.tensor(x.T[None])  # [1, C, T]
    tw = torch.tensor(w)
    ref = torch.nn.functional.conv1d(
        torch.nn.functional.pad(tx, (K - 1, 0)), tw.unsqueeze(1), groups=C
    )
    ref = torch.nn.functional.silu(ref)[0].T.numpy()

    y, state = gdn.causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.int32(T))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
    # state = last K inputs
    np.testing.assert_allclose(np.asarray(state), x[-K:], rtol=1e-6, atol=1e-6)


def test_conv1d_step_matches_torch_update():
    rng = np.random.default_rng(4)
    B, C, K = 2, 6, 4
    state0 = _rand(rng, B, K, C)
    x = _rand(rng, B, C)
    w = _rand(rng, C, K)

    t_state = torch.tensor(np.transpose(state0, (0, 2, 1)).copy())  # [B, C, K]
    ref = torch_causal_conv1d_update(
        torch.tensor(x[:, :, None].copy()), t_state, torch.tensor(w), activation="silu"
    )[:, :, 0].numpy()

    y, state1 = gdn.causal_conv1d_step(jnp.asarray(x), jnp.asarray(w), jnp.asarray(state0))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state1), np.transpose(t_state.numpy(), (0, 2, 1)), rtol=1e-6, atol=1e-6
    )
