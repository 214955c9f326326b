"""Block-scaled quantization: FP8(E4M3) / FP4(E2M1) with E8M0 scales.

DeepSeek-V4 weight formats (reference: pegainfer-deepseek-v4/src/model.rs
fp8_linear/fp4_linear; kernels tools/tilelang/deepseek_v4/generate.py,
adapted there from DeepSeek's official inference/kernel.py):

- FP8 linear: weight E4M3 [out, in], scale E8M0 per [128 out x 128 in]
  block. Activations are quantized per row-group of 128 with
  scale = round_up_pow2(amax / 448).
- FP4 linear: weight E2M1 [out, in], scale E8M0 per [1 out x 32 in] group.

On TPU the compute path dequantizes to bf16 and feeds the MXU (weights stay
quantized in HBM; XLA fuses the dequant into the matmul epilogue); the
helpers here define the *reference numerics* and the storage format.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

FP8_MAX = 448.0  # E4M3 max normal
FP4_MAX = 6.0  # E2M1 max

F8 = jnp.float8_e4m3fn
F4 = jnp.float4_e2m1fn
E8M0 = jnp.float8_e8m0fnu


def round_scale_pow2(amax: jnp.ndarray, fmt_max: float) -> jnp.ndarray:
    """Power-of-two scale >= amax/fmt_max (reference fast_round_scale:
    exponent ceil in log2). Returns f32 (exactly representable in E8M0)."""
    ratio = jnp.maximum(amax.astype(jnp.float32) / fmt_max, 1e-38)
    exp = jnp.ceil(jnp.log2(ratio))
    return jnp.exp2(exp)


def quant_fp8_blocks(w: np.ndarray, block: int = 128):
    """Weight → (E4M3 values, E8M0 scales [ceil(out/128), ceil(in/128)])."""
    out_dim, in_dim = w.shape
    ob, ib = -(-out_dim // block), -(-in_dim // block)
    wp = np.zeros((ob * block, ib * block), np.float32)
    wp[:out_dim, :in_dim] = np.asarray(w, np.float32)
    blocks = wp.reshape(ob, block, ib, block)
    amax = np.abs(blocks).max(axis=(1, 3))
    scales = np.asarray(round_scale_pow2(jnp.asarray(amax), FP8_MAX))
    q = (blocks / scales[:, None, :, None]).reshape(ob * block, ib * block)
    q8 = jnp.asarray(q[:out_dim, :in_dim]).astype(F8)
    return q8, jnp.asarray(scales).astype(E8M0)


def dequant_fp8_blocks(q: jax.Array, scales: jax.Array, block: int = 128,
                       dtype=jnp.bfloat16) -> jax.Array:
    """Inverse of quant_fp8_blocks → [out, in] dtype."""
    out_dim, in_dim = q.shape
    s = scales.astype(jnp.float32)
    s_full = jnp.repeat(jnp.repeat(s, block, axis=0), block, axis=1)[
        :out_dim, :in_dim
    ]
    return (q.astype(jnp.float32) * s_full).astype(dtype)


def quant_fp4_groups(w: np.ndarray, group: int = 32):
    """Weight → (E2M1 values, E8M0 scales [out, in/32])."""
    out_dim, in_dim = w.shape
    group = min(group, in_dim)
    assert in_dim % group == 0, (in_dim, group)
    g = np.asarray(w, np.float32).reshape(out_dim, in_dim // group, group)
    amax = np.abs(g).max(axis=-1)
    scales = np.asarray(round_scale_pow2(jnp.asarray(amax), FP4_MAX))
    q = (g / scales[..., None]).reshape(out_dim, in_dim)
    return jnp.asarray(q).astype(F4), jnp.asarray(scales).astype(E8M0)


def dequant_fp4_groups(q: jax.Array, scales: jax.Array, group: Optional[int] = None,
                       dtype=jnp.bfloat16) -> jax.Array:
    out_dim, in_dim = q.shape
    group = group or in_dim // scales.shape[1]
    s = jnp.repeat(scales.astype(jnp.float32), group, axis=1)
    return (q.astype(jnp.float32) * s).astype(dtype)


# ── Int8 weight-only serving mode (TPU upside beyond reference parity:
# halves the HBM bytes streamed per decode step — the decode bottleneck) ──


def quant_int8_channel(w: jax.Array):
    """[in, out] → (int8 values, f32 scale per output channel)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale[0]


def int8_linear(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x [.., in] @ int8 [in, out] * scale [out] — the int8→bf16 convert
    fuses into the dot's operand read on TPU (weights stream as int8)."""
    y = jax.lax.dot_general(
        x, q.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * scale).astype(x.dtype)


def fp8_linear(x: jax.Array, q: jax.Array, scales: jax.Array,
               block: int = 128) -> jax.Array:
    """x [.., in] @ dequant(q).T → [.., out] in x.dtype."""
    w = dequant_fp8_blocks(q, scales, block, dtype=x.dtype)
    return x @ w.T


def fp4_linear(x: jax.Array, q: jax.Array, scales: jax.Array,
               group: int = 32) -> jax.Array:
    w = dequant_fp4_groups(q, scales, group, dtype=x.dtype)
    return x @ w.T
