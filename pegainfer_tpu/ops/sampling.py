"""On-device sampling: greedy argmax and temperature/top-k/top-p.

Reference semantics (pegainfer-kernels/csrc/flashinfer_sampling.cu +
src/ops/sampling.rs): temperature==0 → greedy top-1; otherwise
softmax(logits/temperature) → top-k filter → top-p (nucleus) filter →
draw with one uniform ``random_val`` per request (inverse-CDF here, so the
draw is a pure deterministic function of logits and random_val).

The executor picks ``sample_greedy`` statically when every request in the
batch is greedy, keeping the full-vocab sort out of the benchmark hot path —
logits never leave the device either way (SURVEY.md §7 hard-part #5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def sample_greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """logits: [B, V] → [B] int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample(logits, temperature, top_k, top_p, random_val):
    """General sampling. logits: [B, V]; the rest: [B].

    top_k <= 0 disables the top-k filter; top_p >= 1.0 disables nucleus.
    Greedy rows (temperature == 0) take argmax exactly.
    """
    B, V = logits.shape
    lf = logits.astype(jnp.float32)
    greedy = temperature <= 0.0
    greedy_tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)

    safe_t = jnp.where(greedy, 1.0, temperature)[:, None]
    probs = jax.nn.softmax(lf / safe_t, axis=-1)

    sorted_probs, sorted_idx = lax.top_k(probs, V)  # descending
    cum = jnp.cumsum(sorted_probs, axis=-1)
    rank = lax.broadcasted_iota(jnp.int32, (B, V), 1)

    k_mask = (top_k[:, None] <= 0) | (rank < top_k[:, None])
    # nucleus: keep entries whose exclusive prefix sum is still < top_p
    # (the first entry is always kept)
    p_mask = (cum - sorted_probs) < top_p[:, None]
    filt = jnp.where(k_mask & p_mask, sorted_probs, 0.0)

    cum_filt = jnp.cumsum(filt, axis=-1)
    total = cum_filt[:, -1:]
    r = random_val[:, None] * total
    # inverse CDF: first entry with cum_filt > r
    pick = jnp.minimum(jnp.sum((cum_filt <= r).astype(jnp.int32), axis=-1), V - 1)
    # ensure picked entry is an unfiltered one: clamp to last kept index
    last_kept = jnp.maximum(jnp.sum((filt > 0.0).astype(jnp.int32), axis=-1) - 1, 0)
    pick = jnp.minimum(pick, last_kept)
    sampled_tok = jnp.take_along_axis(sorted_idx, pick[:, None], axis=-1)[:, 0]
    return jnp.where(greedy, greedy_tok, sampled_tok.astype(jnp.int32))


def token_logprob(logits, tokens):
    """log_softmax(logits)[token] per row. logits: [B, V], tokens: [B] → [B] f32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[:, None].astype(jnp.int32), axis=-1)[:, 0]


def top_logprobs(logits, n: int):
    """Top-n (logprob, token) per row. Returns (values [B, n] f32, ids [B, n] i32)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = lax.top_k(logp, n)
    return vals, ids.astype(jnp.int32)
