"""FP4 dequant-GEMV kernel variant study (on-chip).

Finds where the time goes at real DSv4 expert shapes: DMA floor vs VPU
decode vs per-program overhead vs tile size. Each variant times ONE
pallas_call shape (the [M, I, D] w13-style GEMV), 20 dispatch-fused iters.

Run: python scripts/fp4_kernel_study.py
"""
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

E, OUT, IN = 256, 2048, 4096
IN2 = IN // 2
S = IN // 32
M = 12
ITERS = 20

rng = np.random.default_rng(0)
q = jnp.asarray(rng.integers(0, 256, (E, OUT, IN2), dtype=np.uint8))
s = jnp.asarray(
    np.exp2(rng.integers(-8, 0, (E, OUT, S))).astype(np.float32), jnp.bfloat16)
x = jnp.asarray(rng.standard_normal((M, IN)).astype(np.float32))
idx_all = jnp.asarray(rng.integers(0, E, (ITERS, M)), jnp.int32)

BYTES = M * OUT * IN2  # packed bytes per iter (scales excluded, 1/32)


def decode_arith(code):
    e = (code >> 1) & 3
    m = code & 1
    mag = jnp.where(e == 0, 0.5 * m.astype(jnp.float32),
                    0.25 * ((2 + m) << e).astype(jnp.float32))
    return mag * (1.0 - 2.0 * (code >> 3).astype(jnp.float32))


def decode_bits(code):
    # build bf16 bit patterns directly: s<<15 | (126+e)<<7 | m<<6 (e>0);
    # e==0: m ? 0.5 : 0  — pure int16 ops, no converts
    e = (code >> 1) & 3
    m = code & 1
    sign = (code >> 3) << 15
    normal = ((126 + e) << 7) | (m << 6)
    sub = jnp.where(m == 1, 126 << 7, 0)
    bits = (sign | jnp.where(e > 0, normal, sub)).astype(jnp.uint16)
    return pltpu.bitcast(bits, jnp.bfloat16)


def expand_scales(sb, in2, rep):
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (sb.shape[1], in2), 0)
    j_grp = jax.lax.broadcasted_iota(jnp.int32, (sb.shape[1], in2), 1) // rep
    expand = (g_ids == j_grp).astype(jnp.bfloat16)
    return jax.lax.dot_general(sb, expand, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_kernel(variant, TO):
    rep = IN2 // S

    def kern(idx_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref):
        m = pl.program_id(1)
        qb = q_ref[0].astype(jnp.int32)
        sb = s_ref[0]
        if variant == "floor":  # no decode: DMA + dot floor
            w_lo = qb.astype(jnp.bfloat16)
            w_hi = w_lo
        elif variant == "arith":
            srep = expand_scales(sb, IN2, rep)
            w_lo = (decode_arith(qb & 0xF) * srep).astype(jnp.bfloat16)
            w_hi = (decode_arith(qb >> 4) * srep).astype(jnp.bfloat16)
        elif variant == "bits":
            srep = expand_scales(sb, IN2, rep).astype(jnp.bfloat16)
            w_lo = decode_bits(qb & 0xF) * srep
            w_hi = decode_bits(qb >> 4) * srep
        elif variant == "bits_noscale":  # decode, fold scale later (wrong
            w_lo = decode_bits(qb & 0xF)  # numerics — cost probe only)
            w_hi = decode_bits(qb >> 4)
        acc = jax.lax.dot_general(
            w_lo, xlo_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            w_hi, xhi_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, m, :] = acc[:, 0]

    return kern


def build(variant, TO, m_outer=False):
    GO = OUT // TO
    Mp = -(-M // 8) * 8
    kern = make_kernel(variant, TO)

    def call(x_, idx):
        xb = x_.astype(jnp.bfloat16)
        x_lo = xb[:, 0::2][..., None]
        x_hi = xb[:, 1::2][..., None]
        grid = (M, GO) if m_outer else (GO, M)

        def imap(a, b, idx_ref):
            o, m = (b, a) if m_outer else (a, b)
            return (idx_ref[m], o, 0)

        def xmap(a, b, idx_ref):
            m = a if m_outer else b
            return (m, 0, 0)

        def omap(a, b, idx_ref):
            o = b if m_outer else a
            return (o, 0, 0)

        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, IN2, 1), xmap),
                    pl.BlockSpec((1, IN2, 1), xmap),
                    pl.BlockSpec((1, TO, IN2), imap),
                    pl.BlockSpec((1, TO, S), imap),
                ],
                out_specs=pl.BlockSpec((1, Mp, TO), omap),
            ),
            out_shape=jax.ShapeDtypeStruct((GO, Mp, TO), jnp.float32),
        )(idx.astype(jnp.int32), x_lo, x_hi, q, s)
        return out.swapaxes(0, 1).reshape(Mp, OUT)[:M]

    # m_outer revisiting is illegal for out block (non-consecutive) — mark
    if m_outer:
        raise SystemExit("m_outer variant needs a different out layout")
    return call


def timeit(name, fn):
    @jax.jit
    def run(x_, idxs):
        def body(acc, idx):
            return acc + fn(x_, idx).sum(), None
        return jax.lax.scan(body, 0.0, idxs)[0]

    t0 = time.time()
    np.asarray(run(x, idx_all))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(x, idx_all))
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{name:28s} {best*1e3:7.3f} ms/iter  {BYTES/best/1e9:6.0f} GB/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return best


for variant in ("floor", "bits_noscale", "bits", "arith"):
    for TO in (256, 512, 1024):
        timeit(f"{variant} TO={TO}", build(variant, TO))
