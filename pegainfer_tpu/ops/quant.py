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
    exponent ceil in log2). Returns f32 (exactly representable in E8M0).
    On-device form (dsa.fp8_round_nope uses it inside the jitted step)."""
    ratio = jnp.maximum(amax.astype(jnp.float32) / fmt_max, 1e-38)
    exp = jnp.ceil(jnp.log2(ratio))
    return jnp.exp2(exp)


def _round_scale_pow2_np(amax: np.ndarray, fmt_max: float) -> np.ndarray:
    ratio = np.maximum(np.asarray(amax, np.float32) / fmt_max, 1e-38)
    return np.exp2(np.ceil(np.log2(ratio))).astype(np.float32)


def quant_fp8_blocks(w: np.ndarray, block: int = 128):
    """Weight → (E4M3 values, E8M0 scales [ceil(out/128), ceil(in/128)]).

    Pure numpy/ml_dtypes (HOST-side: checkpoint writers must not touch the
    device — this TPU rejects E8M0 programs, and quantization is load-time
    work anyway). Returns numpy arrays.
    """
    import ml_dtypes

    out_dim, in_dim = w.shape
    ob, ib = -(-out_dim // block), -(-in_dim // block)
    wp = np.zeros((ob * block, ib * block), np.float32)
    wp[:out_dim, :in_dim] = np.asarray(w, np.float32)
    blocks = wp.reshape(ob, block, ib, block)
    amax = np.abs(blocks).max(axis=(1, 3))
    scales = _round_scale_pow2_np(amax, FP8_MAX)
    q = (blocks / scales[:, None, :, None]).reshape(ob * block, ib * block)
    q8 = q[:out_dim, :in_dim].astype(ml_dtypes.float8_e4m3fn)
    return q8, scales.astype(ml_dtypes.float8_e8m0fnu)


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
    """Weight → (E2M1 values, E8M0 scales [out, in/32]). Pure numpy
    (host-side; see quant_fp8_blocks). Values round to nearest-even E2M1."""
    import ml_dtypes

    out_dim, in_dim = w.shape
    group = min(group, in_dim)
    assert in_dim % group == 0, (in_dim, group)
    g = np.asarray(w, np.float32).reshape(out_dim, in_dim // group, group)
    amax = np.abs(g).max(axis=-1)
    scales = _round_scale_pow2_np(amax, FP4_MAX)
    q = (g / scales[..., None]).reshape(out_dim, in_dim)
    return q.astype(ml_dtypes.float4_e2m1fn), scales.astype(
        ml_dtypes.float8_e8m0fnu
    )


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


# ── Quantized-resident containers ────────────────────────────────────────
# A quantized weight travels the params pytree as {"q": values, "s": scales}
# (kind inferred from q.dtype: E4M3 → 128×128-blocked fp8, E2M1 → per-row
# 32-grouped fp4). This is the TPU answer to the reference's quantized-in-HBM
# serving (deepseek-v4/src/model.rs fp8_linear/fp4_linear over
# deepseek_quant.cu): weights stay E4M3/E2M1 (+E8M0 scales) in device memory
# — ~0.55 bytes/param for the MoE experts instead of 2 (bf16) — and the
# dequant runs on the fly inside the jitted step, fused by XLA into the
# consuming dot where possible.
#
# Block/group sizes are INFERRED from the shape ratio q.shape[-1]/s.shape[-1]
# (and rows for fp8). This makes mp8 rank concatenation exact at any scale:
# each rank's scale array covers its real rows/cols whether the rank shard is
# ≤1 block (tiny test fixtures) or 128-aligned (the real 671B checkpoint).
#
# Scales are stored BF16, not E8M0: this chip's XLA rejects F8E8M0FNU
# ("Element type F8E8M0FNU is not supported on TPU", measured), and every
# E8M0 value (pow2, exponent −127..127) is exactly representable in bf16 —
# zero numerics change, scale bytes are weights/64 (negligible).
SCALE_DTYPE = jnp.bfloat16

# FP4 values are stored PACKED, two E2M1 nibbles per uint8 (low nibble =
# even element), exactly the reference checkpoint's on-disk F4 layout —
# true 0.5 bytes/param in HBM. Two reasons over jnp.float4_e2m1fn device
# arrays: (a) this backend cannot pass F4 arrays across a jit boundary
# (device_put recursion bug, measured: "RecursionError: Recursively
# calling jit ... F4E2M1FN"); (b) the real checkpoint's packed bytes load
# without any repacking. The decode is a 16-entry LUT gather fused into
# the consuming program.

_F4_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0], np.float32
)


def pack_fp4(arr: np.ndarray) -> np.ndarray:
    """Host-side: float values (E2M1-exact or to-be-rounded) → packed uint8
    [..., in/2], low nibble first (reference packed-F4 byte order)."""
    import ml_dtypes

    codes = np.asarray(arr).astype(ml_dtypes.float4_e2m1fn).view(np.uint8)
    assert codes.shape[-1] % 2 == 0, codes.shape
    return (codes[..., 0::2] | (codes[..., 1::2] << 4)).astype(np.uint8)


def _decode_e2m1_arith(code: jax.Array, dtype=jnp.float32) -> jax.Array:
    """E2M1 codes (int32 0..15) → values, pure arithmetic.

    value = sign * (e == 0 ? 0.5*m : ((2+m) << e) / 4), s=bit3, e=bits1-2,
    m=bit0. A 16-entry LUT gather is PATHOLOGICAL on XLA:TPU (it lowers to
    a serialized full gather — measured 2860 ms vs 2.78 ms for one decode
    MoE chain at 256-expert scale, scripts/fp4_gemv_bench.py); elementwise
    arithmetic fuses."""
    e = (code >> 1) & 3
    m = code & 1
    mag = jnp.where(
        e == 0,
        0.5 * m.astype(jnp.float32),
        0.25 * ((2 + m) << e).astype(jnp.float32),
    )
    return (mag * (1.0 - 2.0 * (code >> 3).astype(jnp.float32))).astype(dtype)


def unpack_fp4(q: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Device-side: packed uint8 [..., in/2] → values [..., in] dtype
    (arithmetic E2M1 decode — see _decode_e2m1_arith)."""
    qi = q.astype(jnp.int32)
    lo = _decode_e2m1_arith(qi & 0xF, dtype)
    hi = _decode_e2m1_arith(qi >> 4, dtype)
    return jnp.stack([lo, hi], axis=-1).reshape(*q.shape[:-1], 2 * q.shape[-1])


def is_quantized(w) -> bool:
    return isinstance(w, dict) and set(w.keys()) >= {"q", "s"}


def quantize_int8_stack(w) -> dict:
    """[E, out, in] expert stack → int8-resident container
    ({"q": int8 [E, out, in], "s": f32 [E, out]} — symmetric per-output-
    channel scale).

    The int8-expert SPEED mode (vs the fp4-resident EXACT mode): the fp4
    Pallas GEMV is VPU-bound at ~64 GB/s packed by its per-element
    scale-mul/cast mix (docs/PERF.md round 4); a per-OUTPUT-channel scale
    commutes with the dot, so the int8 kernels apply it outside and the
    per-element work collapses to one hw int8→bf16 convert. 2× the expert
    bytes of fp4, but streamed several× faster. Numerics: like the Qwen
    int8 weight-only mode — a requantization, not checkpoint-exact
    (scales f32, values round-to-nearest, |q| ≤ 127)."""
    wf = np.asarray(w, np.float32)
    amax = np.abs(wf).max(axis=-1)  # [E, out]
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(wf / scale[..., None]), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(scale)}


def dequant_any(w, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize a {"q","s"} container (any leading batch dims).

    fp8:        q E4M3 [.., out, in], s [.., S_o, S_i] — block grid
                (out/S_o, in/S_i).
    fp4 packed: q uint8 [.., out, in/2], s [.., out, S_i] — per-row group
                (2·in/2)/S_i.
    fp4 loose:  q E2M1 [.., out, in] (CPU-only paths), same scale layout.
    layer view: {"q","s","layer"} — q/s carry a leading stacked-layer axis
                and "layer" names the row (models/dsv4 segment scans keep
                the stack OUT of the scan xs; kernels index it in-kernel,
                this XLA fallback slices here).
    """
    q, s = w["q"], w["s"]
    if "layer" in w:
        q = jax.lax.dynamic_index_in_dim(q, w["layer"], 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(s, w["layer"], 0, keepdims=False)
    sf = s.astype(jnp.float32)
    if q.dtype == jnp.int8:  # int8 per-output-channel (quantize_int8_stack)
        assert q.shape[:-1] == s.shape, (q.shape, s.shape)
        return (q.astype(jnp.float32) * sf[..., None]).astype(dtype)
    if q.dtype == jnp.uint8:  # packed fp4
        assert q.shape[:-1] == s.shape[:-1], (q.shape, s.shape)
        vals = unpack_fp4(q, jnp.float32)
        bi, ri = divmod(vals.shape[-1], s.shape[-1])
        assert ri == 0, (q.shape, s.shape)
        return (vals * jnp.repeat(sf, bi, axis=-1)).astype(dtype)
    bi, ri = divmod(q.shape[-1], s.shape[-1])
    assert ri == 0, (q.shape, s.shape)
    if q.dtype == F4:
        assert q.shape[:-1] == s.shape[:-1], (q.shape, s.shape)
        sfull = jnp.repeat(sf, bi, axis=-1)
    else:
        bo, ro = divmod(q.shape[-2], s.shape[-2])
        assert ro == 0, (q.shape, s.shape)
        sfull = jnp.repeat(jnp.repeat(sf, bo, axis=-2), bi, axis=-1)
    return (q.astype(jnp.float32) * sfull).astype(dtype)


# Fused FP8 dequant-GEMV for decode-shaped dense linears (ops/pallas/
# fp4_gemm.fp8_gemv): engine-set like dsv4.set_fp4_kernel — single-device
# TPU resident serving; "interpret" for CPU tests.
_FP8_KERNEL = False


def set_fp8_kernel(on) -> None:
    global _FP8_KERNEL
    _FP8_KERNEL = on


def qlinear(x: jax.Array, w, kernel=None) -> jax.Array:
    """y = x @ W.T where W is a plain [out, in] array or a {"q","s"}
    container (dequantized on the fly in the latter case; decode-shaped
    fp8 containers take the fused Pallas GEMV when enabled — the XLA
    dequant does not keep the f8 bytes fused into the dot).

    ``kernel``: False | True | "interpret" — per-call fp8-GEMV switch
    (threaded from the engine's dsv4.RunModes); None reads the module
    default set by set_fp8_kernel."""
    if kernel is None:
        kernel = _FP8_KERNEL
    if is_quantized(w):
        if kernel and w["q"].dtype == F8 and x.ndim == 2:
            from pegainfer_tpu.ops.pallas.fp4_gemm import (
                fp8_gemv, fp8_gemv_supported,
            )

            if fp8_gemv_supported(w["q"], w["s"], x):
                # layer views carry the stacked [L, ...] weights; the
                # kernel indexes the layer via a prefetched scalar
                y = fp8_gemv(x, w["q"], w["s"],
                             interpret=kernel == "interpret",
                             layer=w.get("layer"))
                return y.astype(x.dtype)
        return x @ dequant_any(w, x.dtype).T
    return x @ w.T


def quantize_fp8_tensor(w, block: int = 128) -> dict:
    """[out, in] array → resident fp8 container (test/transform helper).

    Per-dim block falls back to the full dim when `block` doesn't divide it,
    so the container's inferred block grid (dequant_any) is always exact.
    """
    import ml_dtypes

    wf = np.asarray(w, np.float32)
    out_dim, in_dim = wf.shape
    bo = block if out_dim % block == 0 else out_dim
    bi = block if in_dim % block == 0 else in_dim
    blocks = wf.reshape(out_dim // bo, bo, in_dim // bi, bi)
    amax = np.abs(blocks).max(axis=(1, 3))
    scales = _round_scale_pow2_np(amax, FP8_MAX)
    q = (blocks / scales[:, None, :, None]).reshape(out_dim, in_dim)
    return {"q": jnp.asarray(q.astype(ml_dtypes.float8_e4m3fn)),
            "s": jnp.asarray(scales, SCALE_DTYPE)}


def quantize_fp4_stack(w, group: int = 32) -> dict:
    """[E, out, in] expert stack → resident packed-fp4 container
    ({"q": uint8 [E, out, in/2], "s": bf16 [E, out, in/group]})."""
    arr = np.asarray(w, np.float32)
    g = group if arr.shape[-1] % group == 0 else arr.shape[-1]
    qs = [quant_fp4_groups(arr[e], g) for e in range(arr.shape[0])]
    return {"q": jnp.asarray(np.stack([pack_fp4(a) for a, _ in qs])),
            "s": jnp.asarray(np.stack([b.astype(np.float32) for _, b in qs]),
                             SCALE_DTYPE)}


def gather_dequant(w, idx: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Rows idx of an expert stack ([E, out, in] plain or container) →
    [len(idx), out, in] dtype. Streams only the gathered experts' bytes —
    the decode-MoE bytes/FLOPs become ∝ K (routed) instead of ∝ E
    (reference analog: deepseek_moe.cu moe_local_mapping route compaction)."""
    if is_quantized(w):
        q, s = w["q"], w["s"]
        if "layer" in w:
            q = jax.lax.dynamic_index_in_dim(q, w["layer"], 0, keepdims=False)
            s = jax.lax.dynamic_index_in_dim(s, w["layer"], 0, keepdims=False)
        return dequant_any({"q": q[idx], "s": s[idx]}, dtype)
    return w[idx].astype(dtype)
