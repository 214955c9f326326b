"""Hyper-connections: the DeepSeek-V4 widened residual stream.

Math re-derived from the reference kernels
(pegainfer-kernels/csrc/deepseek_v4/deepseek_hc.cu: hc_expand, hc_mixes,
hc_pre_from_mixes / hc_split_sinkhorn, hc_pre_output, hc_post, hc_head_pre):

The residual stream is ``n = hc_mult`` copies of the hidden state
(x: [T, n, D]). Per layer branch (attention / ffn):

1. mixes[m] = (flat(x) · hc_fn[m]) * rsqrt(mean(flat(x)²) + eps)
   for m < mix_hc = (2+n)*n — an RMS-normalized linear read of the widened
   state.
2. split:
   pre[j]   = sigmoid(mixes[j] * scale0 + base[j]) + eps           (j < n)
   post[j]  = 2 * sigmoid(mixes[n+j] * scale1 + base[n+j])
   comb0    = mixes[2n:] * scale2 + base[2n:]   reshaped [n, n]
3. comb = sinkhorn(comb0): row-softmax (+eps), then col-normalize
   (/(col+eps)), then (iters-1) x [row-normalize, col-normalize].
4. pre-combine: layer_input = Σ_j pre[j] * x[j]                  ([T, D])
5. post-distribute: x'[k] = post[k] * layer_out + Σ_j comb[j, k] * x[j]

All hc math in f32 (weights are stored f32 in the checkpoint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hc_expand(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[T, D] → [T, n, D] (replicate into n streams)."""
    return jnp.broadcast_to(x[:, None, :], (x.shape[0], n, x.shape[1]))


def hc_mixes(x: jnp.ndarray, hc_fn: jnp.ndarray, eps: float) -> jnp.ndarray:
    """x: [T, n, D]; hc_fn: [mix_hc, n*D] f32 → mixes [T, mix_hc] f32."""
    T = x.shape[0]
    flat = x.reshape(T, -1).astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(flat * flat, axis=-1, keepdims=True) + eps)
    return (flat @ hc_fn.astype(jnp.float32).T) * rms


def hc_split_sinkhorn(mixes, scale, base, n: int, iters: int, eps: float):
    """mixes [T, mix_hc]; scale [3]; base [mix_hc].
    Returns (pre [T, n], post [T, n], comb [T, n, n])."""
    m = mixes.astype(jnp.float32)
    scale = scale.astype(jnp.float32)
    base = base.astype(jnp.float32)
    pre = jax.nn.sigmoid(m[:, :n] * scale[0] + base[:n]) + eps
    post = 2.0 * jax.nn.sigmoid(m[:, n:2 * n] * scale[1] + base[n:2 * n])

    comb = (m[:, 2 * n:] * scale[2] + base[2 * n:]).reshape(-1, n, n)
    # first pass: row softmax + eps, then column normalize with +eps
    comb = jax.nn.softmax(comb, axis=-1) + eps
    comb = comb / (jnp.sum(comb, axis=-2, keepdims=True) + eps)
    def body(_, c):
        c = c / (jnp.sum(c, axis=-1, keepdims=True) + eps)
        return c / (jnp.sum(c, axis=-2, keepdims=True) + eps)
    comb = jax.lax.fori_loop(0, iters - 1, body, comb)
    return pre, post, comb


def hc_pre(x, pre):
    """x: [T, n, D]; pre: [T, n] → [T, D] (combined layer input)."""
    return jnp.einsum("tn,tnd->td", pre, x.astype(jnp.float32)).astype(x.dtype)


def hc_post(layer_out, residual, post, comb):
    """layer_out: [T, D]; residual: [T, n, D]; post: [T, n];
    comb: [T, n, n] → new stream [T, n, D].
    out[k] = post[k] * layer_out + Σ_j comb[j, k] * residual[j]."""
    res = jnp.einsum("tjk,tjd->tkd", comb, residual.astype(jnp.float32))
    out = res + post[:, :, None] * layer_out.astype(jnp.float32)[:, None, :]
    return out.astype(residual.dtype)


def hc_head_pre(mixes, scale, base, n: int, eps: float):
    """Final head combine weights (hc_head uses only the first n mixes,
    hc_head_fn shape [n, n*D]): pre[j] = sigmoid(mix[j]*scale0+base[j])+eps."""
    m = mixes.astype(jnp.float32)
    return jax.nn.sigmoid(m[:, :n] * scale.astype(jnp.float32)[0] + base.astype(jnp.float32)[:n]) + eps
