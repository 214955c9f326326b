"""Fused FP4 dequant-GEMV for gathered MoE experts.

The reference's DSv4 decode speed lives in TileLang kernels that dequantize
INSIDE the grouped expert GEMM (pegainfer-kernels/csrc/deepseek_v4/
deepseek_quant.cu moe_fp4_grouped_w13/w2, tools/tilelang/deepseek_v4/
generate.py) — weights cross the memory bus once, as 4-bit packed bytes.
The XLA form (ops/quant.gather_dequant + einsum) cannot do that: the
unpack/LUT/scale chain materializes the gathered experts as a full-width
array in HBM, so each expert streams ~0.5 B/param packed + 2-4 B/param
written + re-read ≈ 8-17x the packed bytes. This kernel is the TPU answer:
packed uint8 rows stream HBM→VMEM (grid-pipelined, double-buffered by
Pallas), E2M1 codes decode arithmetically on the VPU, block scales apply in
bf16 (exact: E2M1 values x pow2 E8M0 scales are bf16-representable), and
the MXU consumes the tile immediately — weight traffic stays ∝ fp4.

Packed layout (ops/quant.py): byte k of a row holds logical elements
2k (low nibble) and 2k+1 (high nibble). Rather than re-interleaving the
decoded halves (an expensive lane shuffle), the CALLER de-interleaves x
once (x_pairs[m,0,:] = x[m,0::2], x_pairs[m,1,:] = x[m,1::2] — tiny) and
the kernel computes w_lo·x_even + w_hi·x_odd, which equals w·x exactly.
A 32-logical-element scale group = 16 contiguous bytes, so one
repeat(s, IN2//S) serves both halves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_e2m1(code: jax.Array) -> jax.Array:
    """E2M1 4-bit codes (int32 0..15) → f32 values.

    value = sign * (e == 0 ? 0.5*m : (2+m) << e) / 4, with s=bit3,
    e=bits1-2, m=bit0 — covers {±0, ±.5, ±1, ±1.5, ±2, ±3, ±4, ±6}.
    Pure VPU arithmetic (a 16-entry LUT gather is a lane-crossing op)."""
    e = (code >> 1) & 3
    m = code & 1
    mag = jnp.where(
        e == 0,
        0.5 * m.astype(jnp.float32),
        0.25 * ((2 + m) << e).astype(jnp.float32),
    )
    sign = 1.0 - 2.0 * (code >> 3).astype(jnp.float32)
    return mag * sign


def _decode_pair_swar(qb: jax.Array):
    """Packed bytes (int32 0..255, [.., IN2]) → (lo, hi) f32 E2M1 values.

    SWAR bf16 bit-pattern construction: both nibbles of every byte decode
    through ONE int32 op stream (nibbles spread to the two 16-bit halves,
    the bf16 bit pattern built per half, then split out by bitcast) —
    roughly half the VPU lane-ops/byte of the arithmetic form, and no
    int→float converts. bf16 magnitude patterns for codes c=0..7 are
    affine: bits = 0x3F00 + 0x40*c, corrected at c==1 (-0x40) and c==0
    (masked to zero); the sign bit moves from nibble bit 3 to bf16 bit 15.
    VERDICT r3 #3: the 'uint16 bits-pattern decode' attacked sideways —
    int32 SWAR avoids the 16-bit forms that hung the Mosaic compile.
    """
    t = (qb | (qb << 12)) & 0x000F000F  # lo nibble at bits 0-3, hi at 16-19
    sign = (t & 0x00080008) << 12       # → bf16 sign bits 15 / 31
    c = t & 0x00070007                  # magnitude codes per half
    c12 = (c >> 1) | (c >> 2)           # (cross-half spill masked below)
    nzb = (c | c12) & 0x00010001        # c != 0, per half
    is1 = (c & ~c12) & 0x00010001       # c == 1, per half
    mag = 0x3F003F00 + (c << 6) - (is1 << 6)
    mask = (nzb << 16) - nzb            # 0x0000/0xFFFF per half (SWAR trick)
    bits = (mag & mask) | sign
    lo = pltpu.bitcast(bits << 16, jnp.float32)
    hi = pltpu.bitcast((bits >> 16) << 16, jnp.float32)
    return lo, hi


def _kernel(*refs, rep: int, swar: bool, stacked: bool = False):
    if stacked:  # extra layer-scalar prefetch ref; blocks carry a lead 1-dim
        idx_ref, l_ref, xlo_ref, xhi_ref, q4, s4, o_ref = refs
        q_ref, s_ref = q4[0], s4[0]
    else:
        idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref = refs
    m = pl.program_id(1)
    qb = q_ref[0].astype(jnp.int32)  # [TO, IN2] packed bytes
    # element-repeat each scale over its group's packed bytes via a one-hot
    # expansion MATMUL: srep = s @ G with G[g, j] = (j // rep == g). Exact
    # (0/1 x bf16 pow2 scales) and Mosaic-friendly — pltpu.repeat has tile
    # semantics, and both the broadcast-reshape and minor-dim-insertion
    # forms of element-repeat are rejected by the vector-layout inference.
    sb = s_ref[0]  # [TO, S] bf16
    to, s_cols = sb.shape
    in2 = q_ref.shape[-1]
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (s_cols, in2), 0)
    j_grp = jax.lax.broadcasted_iota(jnp.int32, (s_cols, in2), 1) // rep
    expand = (g_ids == j_grp).astype(jnp.bfloat16)  # [S, IN2]
    srep = jax.lax.dot_general(
        sb, expand, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TO, IN2] f32
    if swar:
        lo, hi = _decode_pair_swar(qb)
    else:
        lo, hi = _decode_e2m1(qb & 0xF), _decode_e2m1(qb >> 4)
    w_lo = (lo * srep).astype(jnp.bfloat16)
    w_hi = (hi * srep).astype(jnp.bfloat16)
    # standard [TO, K] @ [K, 1] matmuls (the [1, K]-rhs and vector-rhs
    # GEMV forms are rejected by the Mosaic matmul lowering)
    acc = jax.lax.dot_general(
        w_lo, xlo_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        w_hi, xhi_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TO, 1] f32
    # out block [1, M_pad, TO] is revisited across the m-inner grid axis
    # (one row lands per program; pad rows are never written)
    o_ref[0, m, :] = acc[:, 0]


def fp4_gemv_supported(q: jax.Array, s: jax.Array, out_tile: int = 256) -> bool:
    """Shape gate: packed container with MXU/VPU-aligned tiles ([E,...] or
    the stacked [L, E, ...] form)."""
    if q.dtype != jnp.uint8 or q.ndim not in (3, 4):
        return False
    E, OUT, IN2 = q.shape[-3:]
    if s.shape[-3:-1] != (E, OUT) or s.ndim != q.ndim:
        return False
    return (
        IN2 % 128 == 0
        and OUT % min(out_tile, OUT) == 0
        and min(out_tile, OUT) % 32 == 0
        and IN2 % s.shape[-1] == 0
    )


# ── FP4 grouped GEMM (prefill-scale MoE) ─────────────────────────────────
# The prefill path routes T·K rows across ALL experts; the XLA form
# (dequant full expert stacks to bf16 + lax.ragged_dot_general) materializes
# 12.9 GB per layer at the real 256-expert geometry — more than the chip
# (measured OOM, scripts/dsv4_flagship_probe.py round 4). This kernel is
# the reference's TileLang grouped expert GEMM
# (deepseek_quant.cu moe_fp4_grouped_w13/w2_with_workspace_cuda): rows
# sorted by expert are processed in TM-row tiles; each tile's expert
# SEGMENTS stream their packed weight o-tiles HBM→VMEM (double-buffered
# manual DMA — the expert id varies per segment inside a program, so the
# grid index_map cannot express the fetch), decode on the VPU, and the
# MXU accumulates masked per-segment partials. Weight traffic per layer =
# the packed stack once (+ one refetch per tile-crossing segment); no
# bf16 materialization anywhere. Exact for ANY routing skew — no
# capacity factor, segments are derived from the true group sizes.


def _gemm_kernel(seg_e_ref, seg_lo_ref, seg_hi_ref, nseg_ref, l_ref,
                 xlo_ref, xhi_ref, q_hbm, s_hbm, o_ref,
                 wq_buf, ws_buf, sem, *, rep: int, TO: int, swar: bool,
                 stacked: bool, S: int):
    t = pl.program_id(0)
    o = pl.program_id(1)
    n = nseg_ref[t]
    TM = xlo_ref.shape[0]
    IN2 = xlo_ref.shape[1]
    # ws_buf may be lane-padded past the real S columns (manual DMA slices
    # need a 128-aligned last dim; sub-128 scale widths are padded by the
    # caller and sliced back here)
    # stacked weights: whole [L, E, ...] stack is the operand; the layer
    # index rides the prefetched scalar (a scan-xs slice would materialize
    # the layer's packed stack per step — see moe_fp4_gemv docstring)
    qh = q_hbm.at[l_ref[0]] if stacked else q_hbm
    sh = s_hbm.at[l_ref[0]] if stacked else s_hbm

    def start(i, slot):
        e = seg_e_ref[t, i]
        pltpu.make_async_copy(
            qh.at[e, pl.ds(o * TO, TO), :], wq_buf.at[slot],
            sem.at[0, slot]).start()
        pltpu.make_async_copy(
            sh.at[e, pl.ds(o * TO, TO), :], ws_buf.at[slot],
            sem.at[1, slot]).start()

    def wait(slot):
        pltpu.make_async_copy(
            qh.at[0, pl.ds(0, TO), :], wq_buf.at[slot],
            sem.at[0, slot]).wait()
        pltpu.make_async_copy(
            sh.at[0, pl.ds(0, TO), :], ws_buf.at[slot],
            sem.at[1, slot]).wait()

    # one-hot scale expansion operand (see _kernel: Mosaic rejects the
    # element-repeat forms); built once per program
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (S, IN2), 0)
    j_grp = jax.lax.broadcasted_iota(jnp.int32, (S, IN2), 1) // rep
    expand = (g_ids == j_grp).astype(jnp.bfloat16)  # [S, IN2]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    xlo = xlo_ref[:]
    xhi = xhi_ref[:]

    def seg_part(i, slot):
        """Masked [TM, TO] contribution of segment i (buffer `slot`)."""
        qb = wq_buf[slot].astype(jnp.int32)
        if swar:
            lo, hi = _decode_pair_swar(qb)
        else:
            lo, hi = _decode_e2m1(qb & 0xF), _decode_e2m1(qb >> 4)
        srep = jax.lax.dot_general(
            ws_buf[slot][:, :S], expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [TO, IN2]
        wl = (lo * srep).astype(jnp.bfloat16)
        wh = (hi * srep).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            xlo, wl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            xhi, wh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TM, TO]
        in_seg = (rows_i >= seg_lo_ref[t, i]) & (rows_i < seg_hi_ref[t, i])
        return jnp.where((i < n) & in_seg, part, 0.0)

    # 2-buffer pipeline, PAIR-unrolled so buffer indices stay static (a
    # traced slot select copies the whole buffer per iteration — the
    # round-2 paged-decode lesson, docs/PERF.md)
    @pl.when(n > 0)
    def _():
        start(0, 0)

    @pl.when(n > 1)
    def _():
        start(1, 1)

    def pair(j, acc):
        i0 = 2 * j
        i1 = i0 + 1
        wait(0)
        acc = acc + seg_part(i0, 0)

        @pl.when(i0 + 2 < n)
        def _():
            start(i0 + 2, 0)

        @pl.when(i1 < n)
        def _():
            wait(1)
        acc = acc + seg_part(i1, 1)

        @pl.when(i1 + 2 < n)
        def _():
            start(i1 + 2, 1)
        return acc

    acc = jax.lax.fori_loop(
        0, pl.cdiv(n, 2), pair, jnp.zeros((TM, TO), jnp.float32))
    o_ref[:] = acc


def tile_segments(flat_e_sorted: jax.Array, tm: int, n_experts: int):
    """Per-tile expert segments for ``moe_fp4_grouped``.

    flat_e_sorted: [M] int32 ascending expert ids (M % tm == 0; pad rows
    carry a valid expert id — their outputs are masked by the caller).
    Returns (seg_expert [T,tm], seg_lo [T,tm], seg_hi [T,tm], n_seg [T]).
    """
    M = flat_e_sorted.shape[0]
    T = M // tm
    e = flat_e_sorted.reshape(T, tm)
    pos = jnp.arange(tm, dtype=jnp.int32)[None, :]
    is_start = jnp.concatenate(
        [jnp.ones((T, 1), bool), e[:, 1:] != e[:, :-1]], axis=1)
    seg_id = jnp.cumsum(is_start, axis=1).astype(jnp.int32) - 1  # [T, tm]
    n_seg = seg_id[:, -1] + 1
    seg_expert = jnp.zeros((T, tm), jnp.int32).at[
        jnp.arange(T)[:, None], seg_id].set(e)
    seg_lo = jnp.full((T, tm), tm, jnp.int32).at[
        jnp.arange(T)[:, None], seg_id].min(jnp.broadcast_to(pos, (T, tm)))
    seg_hi = jnp.zeros((T, tm), jnp.int32).at[
        jnp.arange(T)[:, None], seg_id].max(pos) + 1
    return seg_expert, seg_lo, seg_hi, n_seg


@functools.partial(jax.jit,
                   static_argnames=("out_tile", "tm", "interpret", "decode"))
def moe_fp4_grouped(
    x_sorted: jax.Array,  # [M, IN] rows SORTED by expert (M % tm == 0)
    q: jax.Array,  # [E, OUT, IN//2] uint8 packed E2M1 (or [L, E, ...])
    s: jax.Array,  # [E, OUT, S] bf16 scales (or [L, E, OUT, S])
    seg_expert: jax.Array, seg_lo: jax.Array, seg_hi: jax.Array,
    n_seg: jax.Array,  # from tile_segments
    out_tile: int = 256,
    tm: int = 128,
    interpret: bool = False,
    decode: str = "swar",
    layer: jax.Array = None,  # REQUIRED for the stacked [L, ...] form
) -> jax.Array:
    """y[m] = x_sorted[m] @ dequant(q[e(m)], s[e(m)]).T — [M, OUT] f32,
    exact grouped expert GEMM over fp4-packed weights (see section doc)."""
    M, IN = x_sorted.shape
    stacked = q.ndim == 4
    E, OUT, IN2 = q.shape[-3:]
    assert IN == 2 * IN2 and M % tm == 0, (x_sorted.shape, q.shape, tm)
    assert stacked == (layer is not None)
    S = s.shape[-1]
    rep = IN2 // S
    TO = min(out_tile, OUT)
    GO = OUT // TO
    T = M // tm
    li = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked
          else jnp.zeros((1,), jnp.int32))
    # lane-pad scales: manual DMA slices need a 128-aligned minor dim
    # (Mosaic: "Slice shape along dimension 3 must be aligned to tiling
    # (128), but is 64" — w2's S = IN/32 = 64 at moe_inter 2048)
    Sp = max(S, 128)
    if Sp != S:
        s = jnp.pad(s.astype(jnp.bfloat16),
                    [(0, 0)] * (s.ndim - 1) + [(0, Sp - S)])

    xb = x_sorted.astype(jnp.bfloat16)
    x_lo = xb[:, 0::2]
    x_hi = xb[:, 1::2]

    out = pl.pallas_call(
        functools.partial(_gemm_kernel, rep=rep, TO=TO,
                          swar=decode == "swar", stacked=stacked, S=S),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # seg_expert, seg_lo, seg_hi, n_seg, layer
            grid=(T, GO),  # o INNER: x tile stays resident across o
            in_specs=[
                pl.BlockSpec((tm, IN2), lambda t, o, *_: (t, 0)),
                pl.BlockSpec((tm, IN2), lambda t, o, *_: (t, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # q stays in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # s stays in HBM
            ],
            out_specs=pl.BlockSpec((tm, TO), lambda t, o, *_: (t, o)),
            scratch_shapes=[
                pltpu.VMEM((2, TO, IN2), jnp.uint8),
                pltpu.VMEM((2, TO, Sp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M, OUT), jnp.float32),
        interpret=interpret,
    )(seg_expert, seg_lo, seg_hi, n_seg, li, x_lo, x_hi, q,
      s.astype(jnp.bfloat16))
    return out


# ── FP8 dense-linear GEMV ────────────────────────────────────────────────
# The DSv4 dense projections (wq_a/wq_b/wkv/wo_b/shared experts/indexer)
# are E4M3 with 128x128-block E8M0 scales. Through XLA the dequant does
# not stay fused into the dot (measured 1.01x vs bf16 — the convert
# materializes bf16 bytes); here the f8 bytes stream HBM→VMEM once and
# convert + scale in-kernel (reference: deepseek_fp8_linear_cuda TileLang,
# deepseek_quant.cu). Decode-shaped (small M); prefill keeps XLA (the
# dequant amortizes over the chunk there).


def _fp8_kernel(*refs, ri: int, stacked: bool = False):
    if stacked:  # blocks carry a leading 1-dim for the layer axis
        l_ref, xcol_ref, q4, s4, o_ref = refs
        q_ref, s_ref = q4[0], s4[0]
    else:
        xcol_ref, q_ref, s_ref, o_ref = refs
    m = pl.program_id(1)
    qb = q_ref[:].astype(jnp.bfloat16)  # [TO, IN] (hw convert)
    to, in_d = qb.shape
    sb = s_ref[:]  # [TO, Si] bf16 — rows pre-expanded by the caller
    si = sb.shape[1]
    # exact one-hot COLUMN expansion (see _kernel: the reshape /
    # minor-dim element-repeat forms are rejected by Mosaic)
    gi = jax.lax.broadcasted_iota(jnp.int32, (si, in_d), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (si, in_d), 1) // ri
    srep = jax.lax.dot_general(
        sb, (gi == ji).astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TO, IN]
    w = (qb.astype(jnp.float32) * srep).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        w, xcol_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TO, 1]
    o_ref[0, m, :] = acc[:, 0]


def _fp8_tile(OUT: int, IN: int, out_tile: int = 256) -> int:
    """VMEM-bound o-tile: intermediates cost ~10 B/(TO·IN) element; a
    256-row tile at IN=8192 blew the 16 MB scoped VMEM (measured)."""
    fit = max(32, (1 << 20) // IN)
    TO = min(out_tile, OUT, fit - fit % 32)
    while TO > 1 and OUT % TO:
        TO //= 2
    return TO


def fp8_gemv_supported(q: jax.Array, s: jax.Array, x: jax.Array,
                       out_tile: int = 256, max_rows: int = 8) -> bool:
    if q.ndim not in (2, 3) or x.ndim != 2 or x.shape[0] > max_rows:
        return False
    if q.ndim == 3 and s.ndim != 3:
        return False
    OUT, IN = q.shape[-2:]
    So, Si = s.shape[-2:]
    TO = _fp8_tile(OUT, IN, out_tile)
    return (
        IN % 128 == 0 and OUT % TO == 0 and TO % 32 == 0
        and OUT % So == 0 and IN % Si == 0 and TO % (OUT // So) == 0
    )


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def fp8_gemv(
    x: jax.Array,  # [M, IN] activations (small M — decode)
    q: jax.Array,  # [OUT, IN] float8_e4m3fn (or [L, OUT, IN])
    s: jax.Array,  # [So, Si] bf16 block scales (or [L, So, Si])
    out_tile: int = 256,
    interpret: bool = False,
    layer: jax.Array = None,  # REQUIRED for the stacked [L, ...] form
) -> jax.Array:
    """y = x @ dequant(q, s).T — [M, OUT] f32; weight bytes stream as f8.

    Grid is (o-tiles, M) with m inner: the o-tile's weight block is
    fetched once and revisited for every row, so weight traffic is
    independent of M. Stacked form: see moe_fp4_gemv — the layer index
    rides the prefetched index_map so no per-layer slice materializes."""
    M, IN = x.shape
    stacked = q.ndim == 3
    OUT = q.shape[-2]
    So, Si = s.shape[-2:]
    assert stacked == (layer is not None)
    ro, ri = OUT // So, IN // Si
    # VMEM-bound the o-tile: the kernel's f32/bf16 intermediates cost
    # ~10 bytes per (TO, IN) element — at flagship IN=8192 a 256-row tile
    # blew the 16 MB scoped VMEM (measured: "20.00M and limit 16.00M")
    TO = _fp8_tile(OUT, IN, out_tile)
    GO = OUT // TO
    Mp = -(-M // 8) * 8
    xcol = x.astype(jnp.bfloat16)[..., None]  # [M, IN, 1]
    # row-expand scales to per-row granularity OUTSIDE the kernel (tiny —
    # ≤ weights/32 bytes; a dynamic sublane slice of the sub-8x128 scale
    # grid inside the kernel is rejected by Mosaic)
    s_rows = jnp.repeat(s.astype(jnp.bfloat16), ro, axis=-2)  # [.., OUT, Si]

    if stacked:
        li = jnp.asarray(layer, jnp.int32).reshape(1)
        out = pl.pallas_call(
            functools.partial(_fp8_kernel, ri=ri, stacked=True),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(GO, M),
                in_specs=[
                    pl.BlockSpec((1, IN, 1), lambda o, m, l_ref: (m, 0, 0)),
                    pl.BlockSpec((1, TO, IN),
                                 lambda o, m, l_ref: (l_ref[0], o, 0)),
                    pl.BlockSpec((1, TO, Si),
                                 lambda o, m, l_ref: (l_ref[0], o, 0)),
                ],
                out_specs=pl.BlockSpec((1, Mp, TO),
                                       lambda o, m, l_ref: (o, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((GO, Mp, TO), jnp.float32),
            interpret=interpret,
        )(li, xcol, q, s_rows)
        return out.swapaxes(0, 1).reshape(Mp, OUT)[:M]

    out = pl.pallas_call(
        functools.partial(_fp8_kernel, ri=ri),
        grid_spec=pl.GridSpec(
            grid=(GO, M),
            in_specs=[
                pl.BlockSpec((1, IN, 1), lambda o, m: (m, 0, 0)),
                pl.BlockSpec((TO, IN), lambda o, m: (o, 0)),
                pl.BlockSpec((TO, Si), lambda o, m: (o, 0)),
            ],
            out_specs=pl.BlockSpec((1, Mp, TO), lambda o, m: (o, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((GO, Mp, TO), jnp.float32),
        interpret=interpret,
    )(xcol, q, s_rows)
    return out.swapaxes(0, 1).reshape(Mp, OUT)[:M]


# ── INT8 expert kernels (speed mode) ─────────────────────────────────────
# The fp4 GEMV is VPU-bound: ~4 lane-ops per element of scale-mul/cast on
# top of the nibble decode cap it at ~64 GB/s packed (measured, docs/
# PERF.md round 4 — the SWAR study showed the roof is the op MIX, not the
# E2M1 decode). int8 with a per-OUTPUT-CHANNEL scale sidesteps the roof
# structurally: the scale commutes with the dot, the caller applies it to
# the [M, OUT] result (M·OUT ops, not M·OUT·IN), and the kernel's
# per-element work is ONE hw int8→bf16 convert feeding the MXU. 2× the
# expert bytes of fp4, streamed at several× the rate — the decode-MoE
# speed mode (ops/quant.quantize_int8_stack; reference analog: the
# TileLang grouped GEMMs' "weights cross the bus once" property,
# deepseek_quant.cu moe_fp4_grouped_w13/w2).


def _int8_kernel(*refs, stacked: bool = False):
    if stacked:  # extra layer-scalar prefetch ref; blocks carry a lead 1-dim
        idx_ref, l_ref, x_ref, q4, o_ref = refs
        q_ref = q4[0]
    else:
        idx_ref, x_ref, q_ref, o_ref = refs
    m = pl.program_id(1)
    w = q_ref[0].astype(jnp.bfloat16)  # [TO, IN] — one hw convert
    acc = jax.lax.dot_general(
        w, x_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TO, 1]
    o_ref[0, m, :] = acc[:, 0]


def int8_gemv_supported(q: jax.Array, out_tile: int = 256) -> bool:
    """Shape gate for the int8 expert kernels ([E, OUT, IN] or stacked
    [L, E, OUT, IN])."""
    if q.dtype != jnp.int8 or q.ndim not in (3, 4):
        return False
    OUT, IN = q.shape[-2:]
    TO = min(out_tile, OUT)
    return IN % 128 == 0 and OUT % TO == 0 and TO % 32 == 0


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def moe_int8_gemv(
    x: jax.Array,  # [M, IN] f32/bf16 activations
    q: jax.Array,  # [E, OUT, IN] int8 (or [L, E, OUT, IN])
    idx: jax.Array,  # [M] int32 expert per row
    out_tile: int = 256,
    interpret: bool = False,
    layer: jax.Array = None,  # REQUIRED for the stacked [L, ...] form
) -> jax.Array:
    """y[m] = x[m] @ q[idx[m]].T — [M, OUT] f32, UNSCALED (the caller
    multiplies by the gathered per-output-channel scales s[idx] — M·OUT
    multiplies). Weight bytes streamed = M · OUT · IN int8; the expert
    gather rides the scalar-prefetched index_map (no materialization)."""
    M, IN = x.shape
    stacked = q.ndim == 4
    OUT = q.shape[-2]
    assert IN == q.shape[-1], (x.shape, q.shape)
    assert stacked == (layer is not None)
    TO = min(out_tile, OUT)
    GO = OUT // TO
    Mp = -(-M // 8) * 8
    xcol = x.astype(jnp.bfloat16)[..., None]  # [M, IN, 1]

    if stacked:
        li = jnp.asarray(layer, jnp.int32).reshape(1)
        q_spec = pl.BlockSpec(
            (1, 1, TO, IN),
            lambda o, m, idx_ref, l_ref: (l_ref[0], idx_ref[m], o, 0))
        x_spec = pl.BlockSpec((1, IN, 1), lambda o, m, idx_ref, l_ref: (m, 0, 0))
        o_spec = pl.BlockSpec((1, Mp, TO), lambda o, m, idx_ref, l_ref: (o, 0, 0))
        extra = (li,)
        nsp = 2
    else:
        q_spec = pl.BlockSpec((1, TO, IN),
                              lambda o, m, idx_ref: (idx_ref[m], o, 0))
        x_spec = pl.BlockSpec((1, IN, 1), lambda o, m, idx_ref: (m, 0, 0))
        o_spec = pl.BlockSpec((1, Mp, TO), lambda o, m, idx_ref: (o, 0, 0))
        extra = ()
        nsp = 1

    out = pl.pallas_call(
        functools.partial(_int8_kernel, stacked=stacked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(GO, M),  # o outer, m inner (out block revisit — see fp4)
            in_specs=[x_spec, q_spec],
            out_specs=o_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((GO, Mp, TO), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), *extra, xcol, q)
    return out.swapaxes(0, 1).reshape(Mp, OUT)[:M]


def _int8_gemm_kernel(seg_e_ref, seg_lo_ref, seg_hi_ref, nseg_ref, l_ref,
                      x_ref, q_hbm, o_ref, wq_buf, sem, *, TO: int,
                      stacked: bool):
    t = pl.program_id(0)
    o = pl.program_id(1)
    n = nseg_ref[t]
    TM = x_ref.shape[0]
    qh = q_hbm.at[l_ref[0]] if stacked else q_hbm

    def start(i, slot):
        e = seg_e_ref[t, i]
        pltpu.make_async_copy(
            qh.at[e, pl.ds(o * TO, TO), :], wq_buf.at[slot],
            sem.at[slot]).start()

    def wait(slot):
        pltpu.make_async_copy(
            qh.at[0, pl.ds(0, TO), :], wq_buf.at[slot],
            sem.at[slot]).wait()

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    x = x_ref[:]

    def seg_part(i, slot):
        """Masked [TM, TO] contribution of segment i (buffer `slot`)."""
        w = wq_buf[slot].astype(jnp.bfloat16)  # [TO, IN]
        part = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TM, TO]
        in_seg = (rows_i >= seg_lo_ref[t, i]) & (rows_i < seg_hi_ref[t, i])
        return jnp.where((i < n) & in_seg, part, 0.0)

    # 2-buffer pipeline, pair-unrolled (static buffer indices — see
    # _gemm_kernel / the round-2 paged-decode lesson)
    @pl.when(n > 0)
    def _():
        start(0, 0)

    @pl.when(n > 1)
    def _():
        start(1, 1)

    def pair(j, acc):
        i0 = 2 * j
        i1 = i0 + 1
        wait(0)
        acc = acc + seg_part(i0, 0)

        @pl.when(i0 + 2 < n)
        def _():
            start(i0 + 2, 0)

        @pl.when(i1 < n)
        def _():
            wait(1)
        acc = acc + seg_part(i1, 1)

        @pl.when(i1 + 2 < n)
        def _():
            start(i1 + 2, 1)
        return acc

    acc = jax.lax.fori_loop(
        0, pl.cdiv(n, 2), pair, jnp.zeros((TM, TO), jnp.float32))
    o_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("out_tile", "tm", "interpret"))
def moe_int8_grouped(
    x_sorted: jax.Array,  # [M, IN] rows SORTED by expert (M % tm == 0)
    q: jax.Array,  # [E, OUT, IN] int8 (or [L, E, OUT, IN])
    seg_expert: jax.Array, seg_lo: jax.Array, seg_hi: jax.Array,
    n_seg: jax.Array,  # from tile_segments
    out_tile: int = 256,
    tm: int = 128,
    interpret: bool = False,
    layer: jax.Array = None,  # REQUIRED for the stacked [L, ...] form
) -> jax.Array:
    """y[m] = x_sorted[m] @ q[e(m)].T — [M, OUT] f32 UNSCALED grouped
    expert GEMM over int8 weights (scales applied by the caller; see the
    int8 section doc). Same tiling/DMA structure as moe_fp4_grouped."""
    M, IN = x_sorted.shape
    stacked = q.ndim == 4
    E, OUT = q.shape[-3:-1]
    assert IN == q.shape[-1] and M % tm == 0, (x_sorted.shape, q.shape, tm)
    assert stacked == (layer is not None)
    TO = min(out_tile, OUT)
    GO = OUT // TO
    T = M // tm
    li = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked
          else jnp.zeros((1,), jnp.int32))
    xb = x_sorted.astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_int8_gemm_kernel, TO=TO, stacked=stacked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # seg_expert, seg_lo, seg_hi, n_seg, layer
            grid=(T, GO),  # o INNER: x tile stays resident across o
            in_specs=[
                pl.BlockSpec((tm, IN), lambda t, o, *_: (t, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # q stays in HBM
            ],
            out_specs=pl.BlockSpec((tm, TO), lambda t, o, *_: (t, o)),
            scratch_shapes=[
                pltpu.VMEM((2, TO, IN), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M, OUT), jnp.float32),
        interpret=interpret,
    )(seg_expert, seg_lo, seg_hi, n_seg, li, xb, q)
    return out


def _int8_chain_kernel(idx_ref, l_ref, x_ref, s1_ref, s3_ref, s2_ref,
                       w1_hbm, w3_hbm, w2_hbm, o_ref,
                       b1, b3, b2, act_buf, sem1, sem3, sem2,
                       *, Mp: int, TI: int, TD: int, limit: float,
                       stacked: bool):
    """Whole routed decode-MoE chain (w1 ‖ w3 → scale → clamped SwiGLU →
    w2 → scale) for all M gathered rows in ONE program: one pallas call
    per layer instead of three, double-buffered int8 weight DMA
    throughout, with the next row's w1/w3 fetch chained behind the last
    w2 tile (round-5 expert-stream study: the big-transfer DMA rate is
    ~437 GB/s — the chain's job is to keep one continuous copy stream)."""
    li = l_ref[0]
    IN1 = w1_hbm.shape[-1]   # D
    IN2 = w2_hbm.shape[-1]   # I
    GI = w1_hbm.shape[-2] // TI
    GD = w2_hbm.shape[-2] // TD

    def at(hbm, m, t, TO):
        if stacked:
            return hbm.at[li, idx_ref[m], pl.ds(t * TO, TO), :]
        return hbm.at[idx_ref[m], pl.ds(t * TO, TO), :]

    def cp1(m, t, slot):
        return pltpu.make_async_copy(at(w1_hbm, m, t, TI), b1.at[slot],
                                     sem1.at[slot])

    def cp3(m, t, slot):
        return pltpu.make_async_copy(at(w3_hbm, m, t, TI), b3.at[slot],
                                     sem3.at[slot])

    def cp2(m, t, slot):
        return pltpu.make_async_copy(at(w2_hbm, m, t, TD), b2.at[slot],
                                     sem2.at[slot])

    # buffer parity rides a GLOBAL tile counter (m*GI + t) so the
    # next-row prefetch always lands where that row's first wait looks —
    # per-row `t % 2` breaks when GI is odd (the prefetch slot collides)
    cp1(0, 0, 0).start()
    cp3(0, 0, 0).start()
    for m in range(Mp):
        xm = x_ref[0, m]  # [D, 1] bf16
        for t in range(GI):
            slot = (m * GI + t) % 2
            if t + 1 < GI:
                cp1(m, t + 1, 1 - slot).start()
                cp3(m, t + 1, 1 - slot).start()
            elif m + 1 < Mp:
                cp1(m + 1, 0, 1 - slot).start()
                cp3(m + 1, 0, 1 - slot).start()
            cp1(m, t, slot).wait()
            cp3(m, t, slot).wait()
            g = jax.lax.dot_general(
                b1[slot].astype(jnp.bfloat16), xm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0]
            u = jax.lax.dot_general(
                b3[slot].astype(jnp.bfloat16), xm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0]
            g = g * s1_ref[0, m, pl.ds(t * TI, TI)]
            u = u * s3_ref[0, m, pl.ds(t * TI, TI)]
            if limit > 0:
                g = jnp.minimum(g, limit)
                u = jnp.clip(u, -limit, limit)
            act_buf[pl.ds(t * TI, TI), 0] = (
                jax.nn.sigmoid(g) * g * u).astype(jnp.bfloat16)
        cp2(m, 0, 0).start()
        for t in range(GD):
            slot = t % 2
            if t + 1 < GD:
                cp2(m, t + 1, 1 - slot).start()
            cp2(m, t, slot).wait()
            y = jax.lax.dot_general(
                b2[slot].astype(jnp.bfloat16), act_buf[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0]
            o_ref[0, m, pl.ds(t * TD, TD)] = (
                y * s2_ref[0, m, pl.ds(t * TD, TD)])


def int8_chain_supported(w1, w2, M: int, in_tile: int = 256,
                         out_tile: int = 256) -> bool:
    """Shape gate for the fused chain: int8 stacks with VMEM-aligned tiles
    and a small (decode-sized) M — the per-row weight stream is
    M·(2·I·D + D·I) bytes, so chain fusion only makes sense where the
    3-call form's per-call costs matter (T·K ≤ ~16)."""
    if w1["q"].dtype != jnp.int8 or w2["q"].dtype != jnp.int8:
        return False
    I, D = w1["q"].shape[-2:]
    D2, I2 = w2["q"].shape[-2:]
    if (D, I) != (D2, I2):
        return False
    return (M <= 16 and I % min(in_tile, I) == 0 and D % 128 == 0
            and D % min(out_tile, D) == 0 and I % 128 == 0)


@functools.partial(jax.jit,
                   static_argnames=("limit", "in_tile", "out_tile",
                                    "interpret"))
def moe_int8_chain(
    x: jax.Array,     # [M, D] f32/bf16 activations
    w1: jax.Array,    # [E, I, D] int8 (or [L, E, I, D])
    w3: jax.Array,
    w2: jax.Array,    # [E, D, I] int8 (or [L, E, D, I])
    s1: jax.Array,    # [E, I] f32 per-output-channel scales (or [L, ...])
    s3: jax.Array,
    s2: jax.Array,    # [E, D] f32
    idx: jax.Array,   # [M] int32 expert per row
    limit: float = 7.0,
    in_tile: int = 256,
    out_tile: int = 256,
    interpret: bool = False,
    layer: jax.Array = None,  # REQUIRED for the stacked [L, ...] form
) -> jax.Array:
    """Fused routed-expert chain: y[m] = swiglu((x@w1ᵀ)·s1, (x@w3ᵀ)·s3)
    @ w2ᵀ · s2, per gathered expert idx[m] — [M, D] f32, scales applied
    in-kernel. One pallas call per layer replaces the three moe_int8_gemv
    calls (+ the XLA swiglu between them)."""
    M, D = x.shape
    stacked = w1.ndim == 4
    I = w1.shape[-2]
    assert D == w1.shape[-1] and w2.shape[-2:] == (D, I), (
        x.shape, w1.shape, w2.shape)
    assert stacked == (layer is not None)
    TI = min(in_tile, I)
    TD = min(out_tile, D)
    li = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked
          else jnp.zeros((1,), jnp.int32))
    # per-row scale gathers ([M, I]/[M, D] f32 — tiny at decode M)
    if stacked:
        s1g = s1[li[0], idx]
        s3g = s3[li[0], idx]
        s2g = s2[li[0], idx]
    else:
        s1g = s1[idx]
        s3g = s3[idx]
        s2g = s2[idx]
    xb = x.astype(jnp.bfloat16)[None, :, :, None]  # [1, M, D, 1]

    out = pl.pallas_call(
        functools.partial(_int8_chain_kernel, Mp=M, TI=TI, TD=TD,
                          limit=limit, stacked=stacked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # idx, layer
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, M, D, 1), lambda g, *_: (0, 0, 0, 0)),
                pl.BlockSpec((1, M, I), lambda g, *_: (0, 0, 0)),
                pl.BlockSpec((1, M, I), lambda g, *_: (0, 0, 0)),
                pl.BlockSpec((1, M, D), lambda g, *_: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, M, D), lambda g, *_: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, TI, D), jnp.int8),
                pltpu.VMEM((2, TI, D), jnp.int8),
                pltpu.VMEM((2, TD, I), jnp.int8),
                pltpu.VMEM((I, 1), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, M, D), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), li, xb, s1g[None], s3g[None], s2g[None],
      w1, w3, w2)
    return out[0]


def _fp4_chain_kernel(idx_ref, l_ref, xlo_ref, xhi_ref,
                      w1_hbm, s1_hbm, w3_hbm, s3_hbm, w2_hbm, s2_hbm,
                      o_ref, b1, bs1, b3, bs3, b2, bs2, act_buf,
                      sem1, sem3, sem2,
                      *, Mp: int, TI: int, TD: int, rep: int, limit: float,
                      stacked: bool, S1: int, S2: int, perm13: bool):
    """Packed-fp4 analog of the int8 chain: SWAR E2M1 decode + group-scale
    expansion per weight tile, clamped SwiGLU between, the activation
    de-interleaved IN-KERNEL by parity-split one-hot matmuls (exact 0/1
    selection — the lane-shuffle-free construction, same trick as the
    scale expansion). With ``perm13`` the caller pre-permuted w1/w3 (and
    s1/s3) output rows to evens-then-odds order, so the SwiGLU buffer
    lands already parity-split and the per-row de-interleave matmuls
    vanish — act_lo/act_hi are lane-aligned half slices."""
    li = l_ref[0]
    D2 = w1_hbm.shape[-1]          # packed input bytes for w1/w3
    I2 = w2_hbm.shape[-1]          # packed input bytes for w2 (= I//2)
    I = w1_hbm.shape[-2]
    GI = I // TI
    GD = w2_hbm.shape[-2] // TD

    def at(hbm, m, t, TO):
        if stacked:
            return hbm.at[li, idx_ref[m], pl.ds(t * TO, TO), :]
        return hbm.at[idx_ref[m], pl.ds(t * TO, TO), :]

    def cp1(m, t, slot):
        return (pltpu.make_async_copy(at(w1_hbm, m, t, TI), b1.at[slot],
                                      sem1.at[0, slot]),
                pltpu.make_async_copy(at(s1_hbm, m, t, TI), bs1.at[slot],
                                      sem1.at[1, slot]))

    def cp3(m, t, slot):
        return (pltpu.make_async_copy(at(w3_hbm, m, t, TI), b3.at[slot],
                                      sem3.at[0, slot]),
                pltpu.make_async_copy(at(s3_hbm, m, t, TI), bs3.at[slot],
                                      sem3.at[1, slot]))

    def cp2(m, t, slot):
        return (pltpu.make_async_copy(at(w2_hbm, m, t, TD), b2.at[slot],
                                      sem2.at[0, slot]),
                pltpu.make_async_copy(at(s2_hbm, m, t, TD), bs2.at[slot],
                                      sem2.at[1, slot]))

    def start(cps):
        for c in cps:
            c.start()

    def wait(cps):
        for c in cps:
            c.wait()

    def make_expand(IN2, S):
        # constant one-hot group-scale expansion mask — built ONCE per
        # shape (hoisted out of the m/t loops; the srep matmul per tile
        # still depends on the streamed scales)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (S, IN2), 0)
        j_grp = jax.lax.broadcasted_iota(jnp.int32, (S, IN2), 1) // rep
        return (g_ids == j_grp).astype(jnp.bfloat16)

    expand1 = make_expand(D2, S1)
    expand2 = expand1 if (I2, S2) == (D2, S1) else make_expand(I2, S2)

    def dequant_w(wbuf, sbuf, expand, S):
        qb = wbuf[...].astype(jnp.int32)
        sb = sbuf[...][:, :S]  # [TO, S] bf16 (lane-padded buffer sliced)
        srep = jax.lax.dot_general(
            sb, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        lo, hi = _decode_pair_swar(qb)
        return ((lo * srep).astype(jnp.bfloat16),
                (hi * srep).astype(jnp.bfloat16))

    def dequant_dot(wbuf, sbuf, xlo, xhi, expand, S):
        # x as [IN2, 1] columns (built on host — no in-kernel minor-dim
        # insertion, which Mosaic only supports for 32-bit types)
        w_lo, w_hi = dequant_w(wbuf, sbuf, expand, S)
        return (jax.lax.dot_general(
            w_lo, xlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                w_hi, xhi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))[:, 0]

    def dequant_dot_row(wbuf, sbuf, xlo_row, xhi_row, expand, S):
        # x as [1, IN2] rows (the parity-split activation — row-vector
        # dot avoids reshaping a 16-bit vector to [IN2, 1])
        w_lo, w_hi = dequant_w(wbuf, sbuf, expand, S)
        return (jax.lax.dot_general(
            xlo_row, w_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                xhi_row, w_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))[0]

    if not perm13:
        # constant parity-selection masks for the legacy (natural-order)
        # layout — hoisted out of the m loop
        cols = jax.lax.broadcasted_iota(jnp.int32, (I, I2), 0)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (I, I2), 1)
        even = (cols == rows2 * 2).astype(jnp.bfloat16)
        odd = (cols == rows2 * 2 + 1).astype(jnp.bfloat16)

    start(cp1(0, 0, 0))
    start(cp3(0, 0, 0))
    for m in range(Mp):
        xlo = xlo_ref[0, m]  # [D2, 1] bf16
        xhi = xhi_ref[0, m]
        for t in range(GI):
            slot = (m * GI + t) % 2
            if t + 1 < GI:
                start(cp1(m, t + 1, 1 - slot))
                start(cp3(m, t + 1, 1 - slot))
            elif m + 1 < Mp:
                start(cp1(m + 1, 0, 1 - slot))
                start(cp3(m + 1, 0, 1 - slot))
            wait(cp1(m, t, slot))
            wait(cp3(m, t, slot))
            g = dequant_dot(b1[slot], bs1[slot], xlo, xhi, expand1, S1)
            u = dequant_dot(b3[slot], bs3[slot], xlo, xhi, expand1, S1)
            if limit > 0:
                g = jnp.minimum(g, limit)
                u = jnp.clip(u, -limit, limit)
            act_buf[0, pl.ds(t * TI, TI)] = (
                jax.nn.sigmoid(g) * g * u).astype(jnp.bfloat16)
        a = act_buf[...]  # [1, I] bf16
        if perm13:
            # w13 rows pre-permuted evens-then-odds: the halves ARE the
            # parity split (lane-aligned slices — I2 % 128 == 0 gated)
            act_lo = a[:, :I2]
            act_hi = a[:, I2:]
        else:
            # de-interleave act by parity (packed byte k of w2 holds
            # input elements 2k / 2k+1): one-hot selection matmuls, exact
            act_lo = jax.lax.dot_general(
                a, even, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            act_hi = jax.lax.dot_general(
                a, odd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        start(cp2(m, 0, 0))
        for t in range(GD):
            slot = t % 2
            if t + 1 < GD:
                start(cp2(m, t + 1, 1 - slot))
            wait(cp2(m, t, slot))
            y = dequant_dot_row(b2[slot], bs2[slot], act_lo, act_hi,
                                expand2, S2)
            o_ref[0, m, pl.ds(t * TD, TD)] = y


def fp4_chain_supported(w1, w2, M: int, in_tile: int = 256,
                        out_tile: int = 256) -> bool:
    """Shape gate for the fused packed-fp4 chain (decode-sized M)."""
    if w1["q"].dtype != jnp.uint8 or w2["q"].dtype != jnp.uint8:
        return False
    I, D2 = w1["q"].shape[-2:]
    D, I2 = w2["q"].shape[-2:]
    if D != 2 * D2 or I != 2 * I2:
        return False
    s1, s2 = w1["s"], w2["s"]
    if s1.shape[-1] == 0 or s2.shape[-1] == 0:
        return False
    return (M <= 16 and I % min(in_tile, I) == 0 and D2 % 128 == 0
            and D % min(out_tile, D) == 0 and I2 % 128 == 0
            and D2 % s1.shape[-1] == 0 and I2 % s2.shape[-1] == 0
            and D2 // s1.shape[-1] == I2 // s2.shape[-1])


def perm13_rows(I: int):
    """Evens-then-odds output-row permutation for the fused fp4 chain.

    Applying ``w[..., perm, :]`` (and the same to the [.., I, S] scales)
    to w1/w3 at LOAD time makes the chain kernel's SwiGLU buffer land
    already parity-split for w2's packed-nibble halves — the in-kernel
    de-interleave matmuls disappear. Exact: a permutation of the hidden
    expert-intermediate dimension, invisible outside the w13→w2 pair."""
    import numpy as np

    return jnp.asarray(
        np.concatenate([np.arange(0, I, 2), np.arange(1, I, 2)]),
        jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("limit", "in_tile", "out_tile",
                                    "interpret", "perm13"))
def moe_fp4_chain(
    x: jax.Array,     # [M, D] f32/bf16 activations
    w1: jax.Array,    # [E, I, D//2] uint8 packed (or [L, E, ...])
    s1: jax.Array,    # [E, I, S] bf16 group scales (or [L, ...])
    w3: jax.Array,
    s3: jax.Array,
    w2: jax.Array,    # [E, D, I//2] uint8 packed
    s2: jax.Array,    # [E, D, S2] bf16
    idx: jax.Array,   # [M] int32 expert per row
    limit: float = 7.0,
    in_tile: int = 256,
    out_tile: int = 256,
    interpret: bool = False,
    layer: jax.Array = None,
    perm13: bool = False,
) -> jax.Array:
    """Fused packed-fp4 routed chain (checkpoint-exact resident mode):
    one pallas call per layer replaces the three moe_fp4_gemv calls.
    Weight traffic stays 4-bit packed end to end. ``perm13=True``
    asserts w1/w3/s1/s3 rows were pre-permuted with :func:`perm13_rows`
    (evens-then-odds), eliminating the in-kernel activation
    de-interleave."""
    M, D = x.shape
    stacked = w1.ndim == 4
    I = w1.shape[-2]
    assert w1.shape[-1] == D // 2 and w2.shape[-2:] == (D, I // 2), (
        x.shape, w1.shape, w2.shape)
    assert stacked == (layer is not None)
    TI = min(in_tile, I)
    TD = min(out_tile, D)
    S1 = s1.shape[-1]
    S2 = s2.shape[-1]
    rep = (D // 2) // S1
    assert (I // 2) // S2 == rep, (s1.shape, s2.shape)
    li = (jnp.asarray(layer, jnp.int32).reshape(1) if stacked
          else jnp.zeros((1,), jnp.int32))

    # lane-pad scales: manual DMA slices need a 128-aligned minor dim
    # (same constraint + fix as moe_fp4_grouped)
    def lane_pad(sv):
        Sp = max(sv.shape[-1], 128)
        if Sp != sv.shape[-1]:
            sv = jnp.pad(sv.astype(jnp.bfloat16),
                         [(0, 0)] * (sv.ndim - 1) + [(0, Sp - sv.shape[-1])])
        return sv

    s1 = lane_pad(s1)
    s3 = lane_pad(s3)
    s2 = lane_pad(s2)
    xb = x.astype(jnp.bfloat16)
    xlo = xb[:, 0::2][None, :, :, None]  # [1, M, D//2, 1]
    xhi = xb[:, 1::2][None, :, :, None]

    out = pl.pallas_call(
        functools.partial(_fp4_chain_kernel, Mp=M, TI=TI, TD=TD, rep=rep,
                          limit=limit, stacked=stacked, S1=S1, S2=S2,
                          perm13=perm13),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # idx, layer
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, M, D // 2, 1), lambda g, *_: (0, 0, 0, 0)),
                pl.BlockSpec((1, M, D // 2, 1), lambda g, *_: (0, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, M, D), lambda g, *_: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, TI, D // 2), jnp.uint8),
                pltpu.VMEM((2, TI, s1.shape[-1]), s1.dtype),
                pltpu.VMEM((2, TI, D // 2), jnp.uint8),
                pltpu.VMEM((2, TI, s3.shape[-1]), s3.dtype),
                pltpu.VMEM((2, TD, I // 2), jnp.uint8),
                pltpu.VMEM((2, TD, s2.shape[-1]), s2.dtype),
                pltpu.VMEM((1, I), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, M, D), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), li, xlo, xhi, w1, s1, w3, s3, w2, s2)
    return out[0]


@functools.partial(jax.jit,
                   static_argnames=("out_tile", "interpret", "decode"))
def moe_fp4_gemv(
    x: jax.Array,  # [M, IN] f32/bf16 activations
    q: jax.Array,  # [E, OUT, IN//2] uint8 packed E2M1 (or [L, E, ...])
    s: jax.Array,  # [E, OUT, S] bf16 scales (or [L, E, OUT, S])
    idx: jax.Array,  # [M] int32 expert per row
    out_tile: int = 256,
    interpret: bool = False,
    decode: str = "swar",  # "swar" | "arith" (identical values)
    layer: jax.Array = None,  # REQUIRED for the stacked [L, ...] form
) -> jax.Array:
    """y[m] = x[m] @ dequant(q[idx[m]], s[idx[m]]).T — [M, OUT] f32.

    Weight bytes streamed = M * OUT * IN/2 packed uint8 (+ scales/64), the
    fp4 speed-of-light; the gather rides the scalar-prefetched index_map
    (no [M, OUT, IN] materialization anywhere).

    Stacked form (q [L, E, OUT, IN2] + ``layer`` scalar): the WHOLE layer
    stack is the kernel operand and the layer rides the prefetched
    index_map — a per-layer slice fed from a lax.scan xs would force XLA
    to materialize a contiguous 3.2 GB copy of the layer's packed experts
    per step (measured: 4.0 → 29.9 ms/step at flagship L=2,
    scripts/dsv4_flagship_probe.py round 4; the KV-pool rule of
    docs/PERF.md applied to weights).
    """
    M, IN = x.shape
    stacked = q.ndim == 4
    E, OUT, IN2 = q.shape[-3:]
    assert IN == 2 * IN2, (x.shape, q.shape)
    assert stacked == (layer is not None)
    S = s.shape[-1]
    rep = IN2 // S
    TO = min(out_tile, OUT)
    GO = OUT // TO
    Mp = -(-M // 8) * 8  # sublane-aligned out rows (pad rows never written)

    # de-interleave x to match the packed nibble halves (see module doc);
    # [M, IN2, 1] column form so the kernel dot is a standard matmul
    xb = x.astype(jnp.bfloat16)
    x_lo = xb[:, 0::2][..., None]
    x_hi = xb[:, 1::2][..., None]

    if stacked:
        li = jnp.asarray(layer, jnp.int32).reshape(1)
        q_spec = pl.BlockSpec(
            (1, 1, TO, IN2), lambda o, m, idx_ref, l_ref: (l_ref[0], idx_ref[m], o, 0))
        s_spec = pl.BlockSpec(
            (1, 1, TO, S), lambda o, m, idx_ref, l_ref: (l_ref[0], idx_ref[m], o, 0))
        x_spec = pl.BlockSpec((1, IN2, 1), lambda o, m, idx_ref, l_ref: (m, 0, 0))
        o_spec = pl.BlockSpec((1, Mp, TO), lambda o, m, idx_ref, l_ref: (o, 0, 0))
        extra = (li,)
        nsp = 2
    else:
        q_spec = pl.BlockSpec((1, TO, IN2),
                              lambda o, m, idx_ref: (idx_ref[m], o, 0))
        s_spec = pl.BlockSpec((1, TO, S),
                              lambda o, m, idx_ref: (idx_ref[m], o, 0))
        x_spec = pl.BlockSpec((1, IN2, 1), lambda o, m, idx_ref: (m, 0, 0))
        o_spec = pl.BlockSpec((1, Mp, TO), lambda o, m, idx_ref: (o, 0, 0))
        extra = ()
        nsp = 1

    out = pl.pallas_call(
        functools.partial(_kernel, rep=rep, swar=decode == "swar",
                          stacked=stacked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            # o OUTER, m inner: the out block (o, *) is revisited across
            # consecutive m-programs (legal revisit), accumulating all M
            # rows in VMEM before one flush per o-tile
            grid=(GO, M),
            in_specs=[x_spec, x_spec, q_spec, s_spec],
            out_specs=o_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((GO, Mp, TO), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), *extra, x_lo, x_hi, q, s.astype(jnp.bfloat16))
    return out.swapaxes(0, 1).reshape(Mp, OUT)[:M]
