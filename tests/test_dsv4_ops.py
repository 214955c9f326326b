"""DeepSeek-V4 op-level tests vs independent NumPy mirrors.

Reference test analog: deepseek-v4/tests/mp8_manifest.rs per-op checks vs
closed-form official formulas (SURVEY.md §4) — no checkpoint exists in this
environment, so every op is validated against a from-scratch NumPy
implementation of the documented semantics.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.ops import dsa, hc, quant


def rnd(key, *shape, scale=1.0):
    return (np.random.default_rng(key).standard_normal(shape) * scale).astype(np.float32)


# ── hyper-connections ────────────────────────────────────────────────────


def np_sinkhorn(comb, iters, eps):
    # row softmax + eps
    e = np.exp(comb - comb.max(-1, keepdims=True))
    c = e / e.sum(-1, keepdims=True) + eps
    c = c / (c.sum(-2, keepdims=True) + eps)
    for _ in range(iters - 1):
        c = c / (c.sum(-1, keepdims=True) + eps)
        c = c / (c.sum(-2, keepdims=True) + eps)
    return c


def test_hc_pipeline_vs_numpy():
    T, n, D = 3, 4, 16
    eps = 1e-6
    x = rnd(0, T, n, D)
    mix_hc = (2 + n) * n
    hc_fn = rnd(1, mix_hc, n * D, scale=0.2)
    scale = np.array([0.7, 1.3, 0.9], np.float32)
    base = rnd(2, mix_hc, scale=0.5)

    mixes = np.asarray(hc.hc_mixes(jnp.asarray(x), jnp.asarray(hc_fn), eps))
    flat = x.reshape(T, -1)
    rms = 1.0 / np.sqrt((flat ** 2).mean(-1, keepdims=True) + eps)
    np.testing.assert_allclose(mixes, (flat @ hc_fn.T) * rms, rtol=1e-5, atol=1e-5)

    pre, post, comb = hc.hc_split_sinkhorn(
        jnp.asarray(mixes), jnp.asarray(scale), jnp.asarray(base), n, 20, eps
    )
    sig = lambda v: 1 / (1 + np.exp(-v))  # noqa: E731
    np.testing.assert_allclose(
        np.asarray(pre), sig(mixes[:, :n] * scale[0] + base[:n]) + eps, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(post), 2 * sig(mixes[:, n:2 * n] * scale[1] + base[n:2 * n]),
        rtol=1e-5,
    )
    comb_ref = np_sinkhorn(
        (mixes[:, 2 * n:] * scale[2] + base[2 * n:]).reshape(T, n, n), 20, eps
    )
    np.testing.assert_allclose(np.asarray(comb), comb_ref, rtol=1e-4, atol=1e-6)
    # sinkhorn output is ~doubly stochastic
    np.testing.assert_allclose(np.asarray(comb).sum(-2), 1.0, atol=1e-3)

    # pre-combine / post-distribute
    inp = np.asarray(hc.hc_pre(jnp.asarray(x), pre))
    np.testing.assert_allclose(
        inp, np.einsum("tn,tnd->td", np.asarray(pre), x), rtol=1e-4, atol=1e-5
    )
    y = rnd(3, T, D)
    out = np.asarray(hc.hc_post(jnp.asarray(y), jnp.asarray(x), post, comb))
    ref = (
        np.einsum("tjk,tjd->tkd", np.asarray(comb), x)
        + np.asarray(post)[:, :, None] * y[:, None, :]
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


# ── rope / yarn ──────────────────────────────────────────────────────────


def test_rope_interleaved_pairs():
    D, rd = 16, 8
    x = rnd(0, 2, D)
    inv = dsa.yarn_inv_freq(rd, 10000.0, 1.0, 32, 1, 0)
    pos = jnp.asarray([3, 7], jnp.int32)
    out = np.asarray(dsa.rope_interleaved(jnp.asarray(x), pos, jnp.asarray(inv), rd))
    # nope dims untouched
    np.testing.assert_array_equal(out[:, : D - rd], x[:, : D - rd])
    # manual pair rotation
    for t, p in enumerate([3, 7]):
        for i in range(rd // 2):
            a = x[t, D - rd + 2 * i]
            b = x[t, D - rd + 2 * i + 1]
            ang = p * inv[i]
            np.testing.assert_allclose(
                out[t, D - rd + 2 * i], a * np.cos(ang) - b * np.sin(ang), rtol=1e-5
            )
            np.testing.assert_allclose(
                out[t, D - rd + 2 * i + 1], a * np.sin(ang) + b * np.cos(ang),
                rtol=1e-5, atol=1e-6,
            )


def test_yarn_matches_reference_formula():
    rd, base, factor = 64, 640000.0, 16.0
    beta_fast, beta_slow, orig = 32, 1, 65536
    inv = dsa.yarn_inv_freq(rd, base, factor, beta_fast, beta_slow, orig)
    plain = 1.0 / base ** (np.arange(rd // 2) * 2.0 / rd)

    def corr(n_rot):
        return rd * math.log(orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))

    low = max(math.floor(corr(beta_fast)), 0)
    high = min(math.ceil(corr(beta_slow)), rd - 1)
    ramp = np.clip((np.arange(rd // 2) - low) / (high - low), 0, 1)
    smooth = 1 - ramp
    ref = plain / factor * (1 - smooth) + plain * smooth
    np.testing.assert_allclose(inv, ref.astype(np.float32), rtol=1e-6)


# ── compressor ───────────────────────────────────────────────────────────


def test_compress_nonoverlap_vs_numpy():
    T, hd, ratio = 12, 8, 4  # use the nonoverlap math even at ratio 4 here
    eps = 1e-6
    scores = rnd(0, T, hd)
    values = rnd(1, T, hd)
    ape = rnd(2, ratio, hd)
    norm_w = np.abs(rnd(3, hd)) + 0.5
    out = np.asarray(
        dsa.compress_nonoverlap(
            jnp.asarray(scores), jnp.asarray(values), jnp.asarray(ape),
            jnp.asarray(norm_w), ratio, eps,
        )
    )
    C = T // ratio
    for c in range(C):
        for d in range(hd):
            s = scores[c * ratio:(c + 1) * ratio, d] + ape[:, d]
            v = values[c * ratio:(c + 1) * ratio, d]
            p = np.exp(s - s.max())
            w = (p * v).sum() / p.sum()
            # rms-norm applied row-wise afterwards; recompute full row
        srow = scores[c * ratio:(c + 1) * ratio] + ape
        vrow = values[c * ratio:(c + 1) * ratio]
        p = np.exp(srow - srow.max(0, keepdims=True))
        w = (p * vrow).sum(0) / p.sum(0)
        ref = w / np.sqrt((w ** 2).mean() + eps) * norm_w
        np.testing.assert_allclose(out[c], ref, rtol=1e-4, atol=1e-5)


def test_compress_overlap_routes():
    T, hd = 16, 4
    eps = 1e-6
    scores = rnd(0, T, 2 * hd)
    values = rnd(1, T, 2 * hd)
    ape = rnd(2, 4, 2 * hd)
    norm_w = np.ones(hd, np.float32)
    out = np.asarray(
        dsa.compress_overlap(
            jnp.asarray(scores), jnp.asarray(values), jnp.asarray(ape),
            jnp.asarray(norm_w), eps,
        )
    )
    C = T // 4
    for c in range(C):
        for d in range(hd):
            ss, vv = [], []
            if c > 0:
                for r in range(4):
                    ss.append(scores[(c - 1) * 4 + r, d] + ape[r, d])
                    vv.append(values[(c - 1) * 4 + r, d])
            for r in range(4):
                ss.append(scores[c * 4 + r, hd + d] + ape[r, hd + d])
                vv.append(values[c * 4 + r, hd + d])
            ss, vv = np.array(ss), np.array(vv)
            p = np.exp(ss - ss.max())
            w_d = (p * vv).sum() / p.sum()
            # collect row for rms
            if d == 0:
                wrow = np.zeros(hd)
            wrow[d] = w_d
        ref = wrow / np.sqrt((wrow ** 2).mean() + eps)
        np.testing.assert_allclose(out[c], ref, rtol=1e-4, atol=1e-5)


# ── indices + indexer ────────────────────────────────────────────────────


def test_window_indices():
    w = np.asarray(dsa.window_indices(5, 3))
    assert w.tolist() == [
        [0, -1, -1], [0, 1, -1], [0, 1, 2], [1, 2, 3], [2, 3, 4],
    ]


def test_compressed_block_indices():
    c = np.asarray(dsa.compressed_block_indices(8, 3, 4, offset=100))
    # valid blocks for token i: (i+1)//4
    assert c[2].tolist() == [-1, -1, -1]
    assert c[3].tolist() == [100, -1, -1]
    assert c[7].tolist() == [100, 101, -1]


def test_topk_strict_tie_break():
    scores = jnp.asarray([[1.0, 3.0, 3.0, 2.0, 5.0]])
    idx = np.asarray(dsa.topk_strict(scores, 4, jnp.asarray([5]), 10))
    # 5.0@4, then 3.0 tie → lower index 1 first, then 2, then 2.0@3
    assert idx[0].tolist() == [14, 11, 12, 13]
    # valid_counts masks the tail
    idx2 = np.asarray(dsa.topk_strict(scores, 4, jnp.asarray([2]), 0))
    assert idx2[0].tolist() == [1, 0, -1, -1]


def test_topk_select_matches_strict():
    """lax.top_k tie semantics (lower index first) == the stable-argsort
    oracle, on tie-heavy inputs — pins the decode fast path's contract."""
    rng = np.random.default_rng(7)
    # quantized scores → many exact ties
    scores = jnp.asarray(rng.integers(0, 4, (6, 37)).astype(np.float32))
    counts = jnp.asarray(rng.integers(1, 38, (6,)), jnp.int32)
    for k in (1, 5, 16):
        ids, valid = dsa.topk_select(scores, k, counts)
        oracle = np.asarray(dsa.topk_strict(scores, k, counts, 0))
        got = np.where(np.asarray(valid), np.asarray(ids), -1)
        np.testing.assert_array_equal(got, oracle)


def test_topk_mask_matches_strict_membership():
    """topk_mask (values-only sort + prefix tie-count) selects EXACTLY the
    topk_strict membership set on tie-heavy inputs — pins the prefill
    shared-part path's strict-> / lowest-index-wins contract."""
    rng = np.random.default_rng(13)
    scores = jnp.asarray(rng.integers(0, 4, (7, 41)).astype(np.float32))
    counts = jnp.asarray(rng.integers(0, 42, (7,)), jnp.int32)
    for k in (1, 5, 16, 41, 60):
        mask = np.asarray(dsa.topk_mask(scores, k, counts))
        oracle_ids = np.asarray(dsa.topk_strict(scores, k, counts, 0))
        want = np.zeros_like(mask)
        for t in range(scores.shape[0]):
            for i in oracle_ids[t]:
                if i >= 0:
                    want[t, i] = True
        np.testing.assert_array_equal(mask, want, err_msg=f"k={k}")


def test_prefill_shared_part_matches_gather_form():
    """The shared-part ratio-4 prefill attention (dense scores + topk_mask)
    == the gathered-row form (sparse_attention over [win ‖ topk_strict])
    — the round-4 restructure's equivalence, on tie-heavy scores."""
    rng = np.random.default_rng(21)
    T, h, d, C, W, k = 6, 2, 8, 9, 3, 4
    q = jnp.asarray(rng.standard_normal((T, h, d)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    ckv = jnp.asarray(rng.standard_normal((C, d)).astype(np.float32))
    sink = jnp.asarray(rng.standard_normal(h).astype(np.float32))
    scores = jnp.asarray(rng.integers(0, 3, (T, C)).astype(np.float32))
    counts = jnp.asarray(rng.integers(0, C + 1, (T,)), jnp.int32)
    scale = d ** -0.5

    win_idx = dsa.window_indices(T, W)
    # gathered form (pre-restructure): kv_all = [kv ‖ ckv], idx offset T
    top_idx = dsa.topk_strict(scores, k, counts, T)
    idx = jnp.concatenate([win_idx, top_idx], axis=1)
    kv_all = jnp.concatenate([kv, ckv], axis=0)
    want = dsa.sparse_attention(q, kv_all, idx, sink, scale)

    # shared-part form (post-restructure)
    sel = dsa.topk_mask(scores, k, counts)
    got = dsa.sparse_attention_parts(
        q, [(kv[jnp.maximum(win_idx, 0)], win_idx >= 0), (ckv, sel)],
        sink, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_sparse_attention_parts_matches_joint():
    """Multi-part online merge == one softmax over the concatenated set."""
    T, h, d = 3, 2, 8
    q = jnp.asarray(rnd(0, T, h, d))
    rows_a = jnp.asarray(rnd(1, T, 4, d))
    rows_b = jnp.asarray(rnd(2, T, 5, d))
    valid_a = jnp.asarray(np.random.default_rng(3).random((T, 4)) > 0.3)
    valid_b = jnp.asarray(np.random.default_rng(4).random((T, 5)) > 0.3)
    sink = jnp.asarray(rnd(5, h))
    out = dsa.sparse_attention_parts(
        q, [(rows_a, valid_a), (rows_b, valid_b)], sink, d ** -0.5)
    joint = dsa.sparse_attention_parts(
        q, [(jnp.concatenate([rows_a, rows_b], axis=1),
             jnp.concatenate([valid_a, valid_b], axis=1))], sink, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(joint),
                               rtol=1e-5, atol=1e-6)


def test_indexer_scores_relu_weighted():
    T, H, dk, C = 2, 3, 4, 5
    q = rnd(0, T, H, dk)
    ck = rnd(1, C, dk)
    w = np.abs(rnd(2, T, H))
    scale = 1 / math.sqrt(dk) / math.sqrt(H)
    s = np.asarray(dsa.indexer_scores(jnp.asarray(q), jnp.asarray(ck), jnp.asarray(w), scale))
    ref = np.zeros((T, C), np.float32)
    for t in range(T):
        for c in range(C):
            ref[t, c] = sum(
                w[t, h] * max(q[t, h] @ ck[c], 0.0) for h in range(H)
            ) * scale
    np.testing.assert_allclose(s, ref, rtol=1e-5, atol=1e-6)


# ── sparse attention core ────────────────────────────────────────────────


def test_sparse_attention_vs_dense_softmax():
    T, h, d, N = 3, 2, 8, 6
    q = rnd(0, T, h, d)
    kv = rnd(1, N, d)
    sink = rnd(2, h)
    scale = d ** -0.5
    idx = jnp.asarray([[0, 1, -1, -1], [0, 1, 2, -1], [2, 3, 4, 5]], jnp.int32)
    out = np.asarray(dsa.sparse_attention(jnp.asarray(q), jnp.asarray(kv), idx, jnp.asarray(sink), scale))
    for t in range(T):
        sel = [i for i in np.asarray(idx)[t] if i >= 0]
        for hh in range(h):
            logits = np.array([q[t, hh] @ kv[i] * scale for i in sel])
            m = max(logits.max(), sink[hh])
            p = np.exp(logits - m)
            denom = p.sum() + np.exp(sink[hh] - m)
            ref = (p[:, None] * kv[sel]).sum(0) / denom
            np.testing.assert_allclose(out[t, hh], ref, rtol=1e-4, atol=1e-5)


def test_fp8_round_nope_touches_only_nope_dims():
    x = rnd(0, 4, 16) * 3
    out = np.asarray(dsa.fp8_round_nope(jnp.asarray(x), rotary_dim=8, group=4))
    np.testing.assert_array_equal(out[:, 8:], x[:, 8:])
    assert not np.array_equal(out[:, :8], x[:, :8])  # quantized
    np.testing.assert_allclose(out[:, :8], x[:, :8], rtol=0.08, atol=0.05)
