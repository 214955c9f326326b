"""DeepSeek sparse attention (DSA) building blocks.

Math re-derived from the reference kernel suite
(pegainfer-kernels/csrc/deepseek_v4/{deepseek_attention,deepseek_compressor,
deepseek_indexer}.cu and the TileLang sparse core
tools/tilelang/deepseek_v4/generate.py sparse_attn_kernel):

- interleaved-pair RoPE on the LAST ``rotary_dim`` dims of a vector
  (pairs (x[2i], x[2i+1]), unlike the rotate-half form used by Qwen);
- YaRN inv_freq correction (only on compressed-attention layers);
- KV compressor: per-dim softmax over a group of ``ratio`` tokens with an
  additive positional bias (APE) on the gate scores, then RMSNorm — the
  overlap (ratio=4) variant mixes 8 routes from the previous + current
  group; compressed tokens then get RoPE at the group-start position and an
  FP8 storage rounding of the non-rope dims;
- lightning indexer: score(t, c) = scale * Σ_h w[t,h] * relu(q_idx[t,h]·ck[c]),
  strict-``>`` top-k with lowest-index tie-break (the candidate-order
  semantics the reference pins as part of its contract, KERNELS.md:45);
- sparse attention core: softmax over an explicit index list into a single
  joint KV vector per position (MLA-style: the same 512-d vector is both key
  and value), with a per-head attention-sink logit in the denominator.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pegainfer_tpu.ops.quant import FP8_MAX, round_scale_pow2

NEG_INF = float(jnp.finfo(jnp.float32).min)


# ── RoPE (interleaved pairs, YaRN) ───────────────────────────────────────


def yarn_inv_freq(rotary_dim: int, base: float, factor: float,
                  beta_fast: float, beta_slow: float,
                  original_seq_len: int) -> np.ndarray:
    """Reference: precompute_rope_cache (runtime/attention_base.rs:92-180).
    original_seq_len == 0 disables the YaRN correction."""
    half = rotary_dim // 2
    inv = 1.0 / base ** (np.arange(half) * 2.0 / rotary_dim)
    if original_seq_len > 0:
        def corr_dim(n_rot):
            return (rotary_dim * math.log(original_seq_len / (n_rot * 2 * math.pi))
                    / (2 * math.log(base)))

        low = max(math.floor(corr_dim(beta_fast)), 0)
        high = min(math.ceil(corr_dim(beta_slow)), rotary_dim - 1)
        if abs(high - low) < np.finfo(np.float32).eps:
            high = high + 0.001
        ramp = np.clip((np.arange(half) - low) / (high - low), 0.0, 1.0)
        smooth = 1.0 - ramp
        inv = inv / factor * (1 - smooth) + inv * smooth
    return inv.astype(np.float32)


def rope_interleaved(x: jnp.ndarray, positions: jnp.ndarray,
                     inv_freq: jnp.ndarray, rotary_dim: int) -> jnp.ndarray:
    """Rotate the last ``rotary_dim`` dims of x as interleaved pairs.

    x: [..., D] with D >= rotary_dim; positions broadcastable to x.shape[:-1].
    """
    nope = x.shape[-1] - rotary_dim
    x_pass, x_rot = x[..., :nope], x[..., nope:]
    pairs = x_rot.reshape(*x_rot.shape[:-1], rotary_dim // 2, 2)
    ang = positions[..., None].astype(jnp.float32) * inv_freq
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    # broadcast [..., half] against pairs [..., half, 2]
    x0 = pairs[..., 0].astype(jnp.float32)
    x1 = pairs[..., 1].astype(jnp.float32)
    out0 = x0 * cos - x1 * sin
    out1 = x0 * sin + x1 * cos
    rot = jnp.stack([out0, out1], axis=-1).reshape(x_rot.shape).astype(x.dtype)
    return jnp.concatenate([x_pass, rot], axis=-1)


def fp8_round_nope(x: jnp.ndarray, rotary_dim: int, group: int = 64) -> jnp.ndarray:
    """Round the non-rope dims through FP8 E4M3 with a pow2 per-group scale
    (storage rounding; reference fp8_act_quant_nope_bf16,
    attention_base.rs:407)."""
    nope = x.shape[-1] - rotary_dim
    if nope == 0:
        return x
    group = min(group, nope)
    x_nope, x_rot = x[..., :nope], x[..., nope:]
    g = x_nope.astype(jnp.float32).reshape(*x_nope.shape[:-1], nope // group, group)
    amax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    scale = round_scale_pow2(amax, FP8_MAX)
    q = (g / scale).astype(jnp.float8_e4m3fn).astype(jnp.float32) * scale
    return jnp.concatenate(
        [q.reshape(x_nope.shape).astype(x.dtype), x_rot], axis=-1
    )


# ── KV compressor ────────────────────────────────────────────────────────


def compress_scores_values(x, wkv, wgate):
    """x: [T, D] → (scores, values): [T, out_dim] f32 (bf16 GEMMs)."""
    scores = (x @ wgate.T).astype(jnp.float32)
    values = (x @ wkv.T).astype(jnp.float32)
    return scores, values


def _rms_norm_f32(w, norm_w, eps):
    inv = jax.lax.rsqrt(jnp.mean(w * w, axis=-1, keepdims=True) + eps)
    return w * inv * norm_w.astype(jnp.float32)


def compress_nonoverlap(scores, values, ape, norm_w, ratio: int, eps: float):
    """Per-dim softmax over each group of ``ratio`` tokens.

    scores/values: [T, hd] f32 (T % ratio == 0 rows used); ape: [ratio, hd].
    Returns [T//ratio, hd] f32 (pre-RoPE compressed tokens).
    """
    C = scores.shape[0] // ratio
    hd = scores.shape[1]
    s = scores[: C * ratio].reshape(C, ratio, hd) + ape.astype(jnp.float32)[None]
    v = values[: C * ratio].reshape(C, ratio, hd)
    p = jax.nn.softmax(s, axis=1)
    w = jnp.sum(p * v, axis=1)  # [C, hd]
    return _rms_norm_f32(w, norm_w, eps)


def compress_overlap(scores, values, ape, norm_w, eps: float):
    """Overlap (ratio=4) compressor: 8 routes per block — 4 from the
    previous group reading dims [0:hd], 4 from the current group reading
    dims [hd:2hd]; block 0 has no previous group.

    scores/values: [T, 2*hd] f32; ape: [4, 2*hd]. Returns [T//4, hd] f32.
    """
    ratio = 4
    two_hd = scores.shape[1]
    hd = two_hd // 2
    C = scores.shape[0] // ratio
    s = scores[: C * ratio].reshape(C, ratio, two_hd) + ape.astype(jnp.float32)[None]
    v = values[: C * ratio].reshape(C, ratio, two_hd)

    # current-group routes: dims [hd:2hd] of block c
    s_cur = s[:, :, hd:]
    v_cur = v[:, :, hd:]
    # previous-group routes: dims [0:hd] of block c-1 (invalid for c == 0)
    s_prev = jnp.concatenate(
        [jnp.full((1, ratio, hd), NEG_INF, jnp.float32), s[:-1, :, :hd]], axis=0
    )
    v_prev = jnp.concatenate(
        [jnp.zeros((1, ratio, hd), jnp.float32), v[:-1, :, :hd]], axis=0
    )
    s_all = jnp.concatenate([s_prev, s_cur], axis=1)  # [C, 8, hd]
    v_all = jnp.concatenate([v_prev, v_cur], axis=1)
    p = jax.nn.softmax(s_all, axis=1)
    w = jnp.sum(p * v_all, axis=1)
    return _rms_norm_f32(w, norm_w, eps)


def compress_block_nonoverlap(sg, vg, ape, norm_w, eps: float):
    """Single-block decode emission. sg/vg: [..., ratio, hd] f32 (the
    group's projections in token order); ape: [ratio, hd].
    Returns [..., hd] f32 — identical math to compress_nonoverlap."""
    s = sg + ape.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-2)
    w = jnp.sum(p * vg, axis=-2)
    return _rms_norm_f32(w, norm_w, eps)


def compress_block_overlap(s_prev, v_prev, s_cur, v_cur, ape, norm_w,
                           eps: float, has_prev):
    """Single-block overlap (ratio 4) emission.

    s_prev/v_prev: [..., 4, 2*hd] projections of the PREVIOUS group's
    tokens; s_cur/v_cur: the current group's; ape: [4, 2*hd];
    has_prev: [...] bool (block 0 has no previous group).
    Returns [..., hd] f32 — identical math to compress_overlap.
    """
    hd = s_cur.shape[-1] // 2
    apef = ape.astype(jnp.float32)
    sp = s_prev[..., :hd] + apef[:, :hd]
    vp = v_prev[..., :hd]
    mask = has_prev[..., None, None]
    sp = jnp.where(mask, sp, NEG_INF)
    vp = jnp.where(mask, vp, 0.0)
    sc = s_cur[..., hd:] + apef[:, hd:]
    vc = v_cur[..., hd:]
    s_all = jnp.concatenate([sp, sc], axis=-2)  # [..., 8, hd]
    v_all = jnp.concatenate([vp, vc], axis=-2)
    p = jax.nn.softmax(s_all, axis=-2)
    w = jnp.sum(p * v_all, axis=-2)
    return _rms_norm_f32(w, norm_w, eps)


# ── Index generation ─────────────────────────────────────────────────────


def window_indices(seq_len: int, window: int) -> jnp.ndarray:
    """Prefill window index lists [T, window]: for query i, keys
    [max(i-window+1, 0) .. i], -1 padded (reference
    deepseek_window_topk_indices_kernel)."""
    t = jnp.arange(seq_len)[:, None]
    r = jnp.arange(window)[None, :]
    key_start = jnp.maximum(t - (window - 1), 0)
    key = key_start + r
    return jnp.where(key <= t, key, -1).astype(jnp.int32)


def window_ring_indices_decode(pos: jnp.ndarray, window: int) -> jnp.ndarray:
    """Decode window indices into a ring KV buffer.

    pos: [B] current token positions (token already written at
    pos % window). Returns [B, window] ring-slot indices covering the last
    min(pos+1, window) tokens, -1 padded (reference
    deepseek_window_topk_indices_decode_kernel; order is irrelevant to the
    softmax)."""
    B = pos.shape[0]
    route = jnp.arange(window, dtype=jnp.int32)[None, :]
    p = pos[:, None]
    ring_pos = p % window
    first = window - 1 - ring_pos
    full = jnp.where(route < first, ring_pos + 1 + route, route - first)
    partial = jnp.where(route <= p, route, -1)
    return jnp.where(p >= window - 1, full, partial).astype(jnp.int32)


def compressed_block_indices(seq_len: int, num_blocks: int, ratio: int,
                             offset: int) -> jnp.ndarray:
    """All-valid compressed block index lists [T, num_blocks]: query i may
    use blocks < (i+1)//ratio; entries are offset+block or -1."""
    t = jnp.arange(seq_len)[:, None]
    b = jnp.arange(num_blocks)[None, :]
    valid = (t + 1) // ratio
    return jnp.where(b < valid, offset + b, -1).astype(jnp.int32)


# ── Lightning indexer ────────────────────────────────────────────────────


def indexer_scores(q_idx, ck, w, scale: float):
    """q_idx: [T, H, dk]; ck: [C, dk]; w: [T, H] →
    scores [T, C] f32 = scale * Σ_h w[t,h] * relu(q[t,h]·ck[c])."""
    dots = jnp.einsum(
        "thd,cd->thc", q_idx.astype(jnp.float32), ck.astype(jnp.float32)
    )
    return jnp.einsum("th,thc->tc", w.astype(jnp.float32), jnp.maximum(dots, 0.0)) * scale


def topk_select(scores, k: int, valid_counts):
    """Strict-> top-k in candidate space: returns (ids [T, k] int32,
    valid [T, k] bool). Same selection contract as ``topk_strict``
    ('score strictly greater wins, else lower index') realized by
    ``lax.top_k``, whose XLA contract returns the lower index first on
    ties — O(C·k) instead of the full argsort.
    ``tests/test_dsv4_ops.py::test_topk_select_matches_strict`` pins the
    tie behavior against the stable-argsort oracle on tie-heavy inputs."""
    T, C = scores.shape
    k = min(k, C)  # reference clamp: index_topk.min(compressed_len)
    cand = jnp.arange(C)[None, :]
    masked = jnp.where(cand < jnp.asarray(valid_counts)[:, None], scores, NEG_INF)
    vals, ids = jax.lax.top_k(masked, k)
    return ids.astype(jnp.int32), vals > -3.0e38


def topk_mask(scores, k: int, valid_counts):
    """Top-k MEMBERSHIP mask [T, C] bool under the same selection contract
    as ``topk_strict`` ('strictly greater wins, else lower index') without
    materializing ordered indices: a values-only descending sort finds the
    k-th surviving value per row, then membership = strictly-above-kth
    plus the LOWEST-index ties filling the remaining slots (prefix-count).
    Feeds the shared-part prefill attention (``sparse_attention_parts``)
    where only membership matters — order never does (softmax is
    permutation-invariant)."""
    T, C = scores.shape
    k = min(k, C)
    cand = jnp.arange(C)[None, :]
    masked = jnp.where(cand < jnp.asarray(valid_counts)[:, None], scores,
                       NEG_INF)
    vals = -jnp.sort(-masked, axis=-1)  # descending, values only
    kth = vals[:, k - 1][:, None]  # [T, 1]
    above = masked > kth
    eq = masked == kth
    # slots left for ties = k - (# strictly above); lowest candidate index
    # wins among equals (cumsum prefix-count)
    n_above = jnp.sum(above, axis=-1, keepdims=True)
    tie_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)
    sel = above | (eq & (tie_rank <= k - n_above))
    return sel & (masked > -3.0e38)  # fully-masked rows select nothing


def topk_strict(scores, k: int, valid_counts, offset):
    """Strict-> top-k with lowest-index tie-break.

    scores: [T, C] f32; valid_counts: [T] (candidates >= count masked);
    offset broadcastable to [T] added to emitted indices. Returns [T, k]
    int32 (-1 padding). A stable descending sort realizes the reference's
    'score strictly greater, else lower index wins' order exactly.
    """
    T, C = scores.shape
    cand = jnp.arange(C)[None, :]
    masked = jnp.where(cand < jnp.asarray(valid_counts)[:, None], scores, NEG_INF)
    order = jnp.argsort(-masked, axis=-1, stable=True)[:, :k]
    picked = jnp.take_along_axis(masked, order, axis=-1)
    live = picked > -3.0e38
    off = jnp.broadcast_to(jnp.asarray(offset), (T,))[:, None]
    out = jnp.where(live, order + off, -1).astype(jnp.int32)
    if k > C:  # candidate list shorter than k: -1 padding (reference
        # emits -1 once the strict-> scan finds nothing above the floor)
        out = jnp.pad(out, ((0, 0), (0, k - C)), constant_values=-1)
    return out


# ── Sparse attention core ────────────────────────────────────────────────


def sparse_attention_parts(q, parts, sink, scale: float):
    """Joint softmax attention over several candidate row sets without
    materializing their concatenation.

    q: [T, h, d]; parts: sequence of (rows [T, Ki, d], valid [T, Ki] bool);
    sink: [h] f32. Returns [T, h, d] in q.dtype. Math identical to
    ``sparse_attention`` over the union of the parts (a joint max is taken
    across parts before exponentiation, so this is an exact regrouping of
    the same softmax, not an approximation). The decode path uses this to
    attend [window ring ‖ gathered top-k rows] without first concatenating
    the ring with the FULL compressed-cache capacity (reference sparse core
    reads selected rows only: deepseek_attention.cu indexed attention /
    tools/tilelang sparse_attn local_h16_d512).
    """
    sinkf = sink.astype(jnp.float32)[None, :]  # [1, h]
    # bf16 inputs keep bf16 MXU dots with f32 ACCUMULATION — the reference
    # sparse core's exact numerics (TileLang sparse_attn: bf16 q·k GEMM,
    # p cast to bf16 before the p·v GEMM, f32 accumulators) — and halve
    # the gathered-row materialization (at flagship prefill the f32 form's
    # [T, 640, 512] f32 transients OOM'd the chip through the engine).
    # f32 inputs (tests/fixture vectors) keep full-f32 dots.
    #
    # A part whose rows are 2-D ([K, d]) is a SHARED candidate set: every
    # query scores the same rows, selection expressed purely by the [T, K]
    # valid mask. This is the prefill top-k form — dense MXU dots over the
    # compressed cache instead of a [T, K, d] gather materialization
    # (measured: the gather is the ratio-4 prefill premium,
    # scripts/dsv4_flagship_probe.py round 4).
    bf16 = q.dtype == jnp.bfloat16
    qc = q if bf16 else q.astype(jnp.float32)
    logits = []
    for rows, valid in parts:
        rf = rows.astype(jnp.bfloat16 if bf16 else jnp.float32)
        eq = "thd,kd->thk" if rows.ndim == 2 else "thd,tkd->thk"
        s = jnp.einsum(eq, qc, rf, preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid[:, None, :], s, NEG_INF)
        logits.append((s, rf, valid))

    m = sinkf
    for s, _, _ in logits:
        m = jnp.maximum(m, jnp.max(s, axis=-1))  # [T, h]
    num = 0.0
    denom = jnp.exp(sinkf - m)
    for s, rf, valid in logits:
        p = jnp.exp(s - m[..., None])
        p = jnp.where(valid[:, None, :], p, 0.0)
        eq = "thk,kd->thd" if rf.ndim == 2 else "thk,tkd->thd"
        num = num + jnp.einsum(eq, p.astype(rf.dtype), rf,
                               preferred_element_type=jnp.float32)
        denom = denom + jnp.sum(p, axis=-1)
    return (num / denom[..., None]).astype(q.dtype)


def sparse_attention(q, kv, idx, sink, scale: float):
    """q: [T, h, d]; kv: [N, d] (joint key=value rows); idx: [T, K] int32
    (-1 = masked); sink: [h] f32. Returns [T, h, d] in q.dtype.

    softmax over the K selected positions plus a per-head sink logit
    (contributes to the denominator only) — reference sparse_attn_kernel.
    """
    gathered = kv[jnp.maximum(idx, 0)]  # [T, K, d]
    return sparse_attention_parts(q, [(gathered, idx >= 0)], sink, scale)
