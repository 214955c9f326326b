"""Rotary position embeddings (GPT-NeoX rotate-half form, as HF Qwen3).

The reference fuses per-head RMSNorm + RoPE in one CUDA kernel
(prefill_attention.cu: qk_norm_rope_batched_decode_cuda); here the fusion is
left to XLA — ``apply_rope`` composes with ``norm.rms_norm`` in the jitted
step.

cos/sin are computed in f32 then cast to the activation dtype before the
multiply, matching HF exactly (our parity oracle).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np


def rope_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray, dtype) -> tuple:
    """positions: [...]; inv_freq: [hd/2] f32. Returns cos, sin: [..., hd]."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [..., H, hd]; cos/sin: [..., hd] (broadcast over the head axis)."""
    c = cos[..., None, :]
    s = sin[..., None, :]
    return x * c + rotate_half(x) * s


def apply_partial_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, rot_dim: int):
    """Rotate only the first ``rot_dim`` features (Qwen3.5 hd256 partial RoPE,
    reference: qk_norm_partial_rope_batched_decode_hd256)."""
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_rot = apply_rope(x_rot, cos[..., :rot_dim], sin[..., :rot_dim])
    return jnp.concatenate([x_rot, x_pass], axis=-1)
