"""Gated Delta Net (linear attention) ops for Qwen3.5 hybrid layers.

Math re-derived from the published Gated Delta Rule recurrence (state
S ∈ R^{dk×dv} per head):

    S_t   = S_{t-1} · exp(g_t) + k_t ⊗ Δ_t,   Δ_t = β_t (v_t − k_tᵀ S_{t-1} exp(g_t))
    o_t   = q_tᵀ S_t

with L2-normalized q/k and q pre-scaled by dk^-1/2 (the HF
Qwen3Next/torch_*_gated_delta_rule semantics — our parity oracle).

Reference-engine analog: gated_delta_rule.cu (single-step decode recurrence)
and the 7-stage Triton chunkwise prefill
(tools/triton/gated_delta_rule_chunkwise_kernels.py, SURVEY.md §2.3). Here
prefill uses the chunkwise form: per chunk, the in-chunk "attention" is the
inverse of a unit-lower-triangular system — computed with a triangular solve
(XLA-native) instead of the reference's row-by-row forward substitution —
followed by a lax.scan carrying the state across chunks. Decode is the O(1)
single-step recurrence, batched over state slots.

All math f32 (the f32-state requirement matches the reference's
RecurrentState, qwen35-4b/src/recurrent_state.rs:14-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return xf * lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)


def gdn_chunk(q, k, v, g, beta, init_state, chunk: int = 64):
    """Chunkwise gated delta rule over one sequence.

    q, k: [T, H, dk]; v: [T, H, dv]; g (log decay), beta: [T, H] f32;
    init_state: [H, dk, dv] f32. T must be a multiple of ``chunk``.
    Padding rows MUST carry g = 0 and beta = 0 (state no-op).
    Returns (out [T, H, dv] f32, final_state [H, dk, dv] f32).
    """
    T, H, dk = q.shape
    dv = v.shape[-1]
    assert T % chunk == 0, (T, chunk)

    qn = l2norm(q) * (dk ** -0.5)
    kn = l2norm(k)
    vf = v.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    # head-major: [H, T, d]
    qh = qn.transpose(1, 0, 2)
    kh = kn.transpose(1, 0, 2)
    vh = vf.transpose(1, 0, 2)
    gh = g.T
    bh = beta.T

    out, final_state = jax.vmap(
        lambda a, b, c, d, e, s: _gdn_chunk_head(a, b, c, d, e, s, chunk)
    )(qh, kh, vh, gh, bh, init_state)
    return out.transpose(1, 0, 2), final_state


def _gdn_chunk_head(q, k, v, g, beta, S0, C: int):
    """One head. q,k: [T, dk]; v: [T, dv]; g,beta: [T]; S0: [dk, dv]."""
    T, dk = q.shape
    dv = v.shape[-1]
    NC = T // C

    qc = q.reshape(NC, C, dk)
    kc = k.reshape(NC, C, dk)
    vc = v.reshape(NC, C, dv)
    gc = g.reshape(NC, C)
    bc = beta.reshape(NC, C)

    g_cum = jnp.cumsum(gc, axis=1)  # [NC, C] in-chunk cumulative log decay
    # decay[i, j] = exp(g_cum[i] - g_cum[j]) on the lower triangle (incl
    # diag). Mask BEFORE exp: upper entries have large positive exponents
    # (inf), and inf * 0 = NaN.
    tril = jnp.tril(jnp.ones((C, C), jnp.float32))
    gdiff = g_cum[:, :, None] - g_cum[:, None, :]
    decay = jnp.exp(jnp.where(tril > 0, gdiff, 0.0)) * tril

    k_beta = kc * bc[..., None]
    v_beta = vc * bc[..., None]

    # In-chunk delta interactions: solve the unit-lower-triangular system
    # (I - A) X = RHS where A = strictly-lower (k_beta kᵀ ∘ decay).
    strict = jnp.tril(jnp.ones((C, C), jnp.float32), k=-1)
    A = -jnp.einsum("nck,ndk->ncd", k_beta, kc) * decay * strict  # [NC, C, C]
    eye = jnp.eye(C, dtype=jnp.float32)
    Tm = jax.scipy.linalg.solve_triangular(
        eye[None] - A, jnp.broadcast_to(eye, (NC, C, C)),
        lower=True, unit_diagonal=True,
    )  # [NC, C, C] = (I - A)^{-1}

    v_prime = jnp.einsum("ncd,ndv->ncv", Tm, v_beta)  # [NC, C, dv]
    k_cd = jnp.einsum("ncd,ndk->nck", Tm, k_beta * jnp.exp(g_cum)[..., None])

    def chunk_step(S, inp):
        qi, ki, vpi, kcdi, gi, di = inp  # [C,dk],[C,dk],[C,dv],[C,dk],[C],[C,C]
        v_new = vpi - kcdi @ S  # [C, dv]
        attn_local = (qi @ ki.T) * di  # [C, C], masked to tril by di
        out_i = (qi * jnp.exp(gi)[:, None]) @ S + attn_local @ v_new
        g_last = gi[-1]
        S_new = S * jnp.exp(g_last) + (ki * jnp.exp(g_last - gi)[:, None]).T @ v_new
        return S_new, out_i

    S_final, out = lax.scan(chunk_step, S0.astype(jnp.float32),
                            (qc, kc, v_prime, k_cd, g_cum, decay))
    return out.reshape(T, dv), S_final


def gdn_step(q, k, v, g, beta, state):
    """Single-token recurrence, batched.

    q, k: [B, H, dk]; v: [B, H, dv]; g, beta: [B, H]; state: [B, H, dk, dv].
    Returns (out [B, H, dv] f32, state').
    """
    dk = q.shape[-1]
    qn = l2norm(q) * (dk ** -0.5)
    kn = l2norm(k)
    vf = v.astype(jnp.float32)
    Sf = state.astype(jnp.float32)

    decay = jnp.exp(g.astype(jnp.float32))[..., None, None]  # [B, H, 1, 1]
    S = Sf * decay
    kv_mem = jnp.einsum("bhk,bhkv->bhv", kn, S)
    delta = (vf - kv_mem) * beta.astype(jnp.float32)[..., None]
    S = S + kn[..., :, None] * delta[..., None, :]
    out = jnp.einsum("bhk,bhkv->bhv", qn, S)
    return out, S


# ── Causal depthwise conv1d (HF Qwen3Next conv semantics) ────────────────


def causal_conv1d(x, w, seq_len):
    """Prefill conv + state extraction.

    x: [T, C] (time-major, padded); w: [C, K]; seq_len: valid count.
    Returns (y [T, C] — silu(conv), state [K, C] — the last K *inputs* at
    position seq_len, zero-padded on the left like HF's F.pad(·, (K-T, 0))).
    """
    T, Cdim = x.shape
    K = w.shape[-1]
    xf = x.astype(jnp.float32)
    xp = jnp.concatenate([jnp.zeros((K - 1, Cdim), jnp.float32), xf], axis=0)
    y = jnp.zeros((T, Cdim), jnp.float32)
    for j in range(K):  # K is tiny (4)
        y = y + w[:, j].astype(jnp.float32)[None, :] * lax.dynamic_slice_in_dim(xp, j, T, 0)
    y = jax.nn.silu(y)

    # state = inputs at positions [seq_len-K, seq_len) (zero-padded left)
    xps = jnp.concatenate([jnp.zeros((K, Cdim), jnp.float32), xf], axis=0)
    state = lax.dynamic_slice_in_dim(xps, seq_len, K, 0)
    return y.astype(x.dtype), state


def causal_conv1d_cont(x, w, prev_state, valid):
    """Prefill-continuation conv: x [Tc, C] is a chunk whose previous K
    inputs are in prev_state [K, C] (oldest first). Returns (y [Tc, C]
    silu'd, new_state [K, C] = the last K inputs before position ``valid``
    within the chunk)."""
    Tc, Cdim = x.shape
    K = w.shape[-1]
    xp = jnp.concatenate([prev_state.astype(jnp.float32),
                          x.astype(jnp.float32)], axis=0)  # [K+Tc, C]
    y = jnp.zeros((Tc, Cdim), jnp.float32)
    for j in range(K):
        y = y + w[:, j].astype(jnp.float32)[None, :] * lax.dynamic_slice_in_dim(
            xp, j + 1, Tc, 0
        )
    state = lax.dynamic_slice_in_dim(xp, valid, K, 0)
    return jax.nn.silu(y).astype(x.dtype), state


def causal_conv1d_step(x, w, state):
    """Decode conv: one new input per row.

    x: [B, C]; w: [C, K]; state: [B, K, C] (last K inputs, oldest first).
    Returns (y [B, C] silu'd, state' [B, K, C]).
    """
    xf = x.astype(jnp.float32)
    window = jnp.concatenate([state[:, 1:].astype(jnp.float32), xf[:, None]], axis=1)
    y = jnp.einsum("bkc,ck->bc", window, w.astype(jnp.float32))
    return jax.nn.silu(y).astype(x.dtype), window
