"""RMSNorm variants. XLA fuses these into neighbors; no Pallas kernel needed.

Numerics match HF Qwen3RMSNorm (and the reference's flashinfer_norm.cu:
rms_norm / fused_add_rms_norm): accumulate in f32, rsqrt, cast back to the
input dtype, then multiply by the (input-dtype) weight.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """x: [..., D]; weight: [D]."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * weight


def rms_norm_zero_centered(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Gemma-style RMSNorm used by Qwen3Next/Qwen3.5: scale is (1 + weight)
    and the multiply happens in f32 BEFORE the cast back (HF
    Qwen3NextRMSNorm semantics)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def fused_add_rms_norm(x, residual, weight, eps):
    """residual' = x + residual; y = rms_norm(residual'). Returns (y, residual')."""
    r = x + residual
    return rms_norm(r, weight, eps), r
