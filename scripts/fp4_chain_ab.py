"""A/B of the packed-fp4 decode-MoE chain variants at the scaled config.

Round-5 continuation: the fp4 chain shipped OPT-IN because its in-kernel
activation de-interleave (per-row one-hot parity-split matmuls) outweighed
the saved call overheads (5.61 vs 5.27 ms engine TPOT, docs/PERF.md).
This bench isolates the MoE chain at the scaled-config expert shapes
(E=32, D=2048, I=1024, M=12, L=12 dependent layers — the decode step's
routed stream) and measures:

  int8-chain    — the production speed-mode kernel (baseline)
  fp4-3call     — three moe_fp4_gemv calls + XLA swiglu (fp4 default)
  fp4-chain     — fused chain, legacy in-kernel de-interleave (hoisted
                  masks after this round's edit)
  fp4-chain-p13 — fused chain with load-time perm13 weight rows: the
                  de-interleave is GONE (act halves are lane slices)

Per variant: a 12-layer dependent chain (layer l+1's x = f(layer l's y),
matching the engine's scan structure), min-of-N step time.

Run (TPU): python scripts/fp4_chain_ab.py
CPU check: python scripts/fp4_chain_ab.py --interpret
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from pegainfer_tpu.ops import quant
from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

p = argparse.ArgumentParser()
p.add_argument("--interpret", action="store_true")
p.add_argument("--iters", type=int, default=16)
p.add_argument("--reps", type=int, default=5)
args = p.parse_args()
if args.interpret:
    jax.config.update("jax_platforms", "cpu")

L, E, D, I, M = 12, 32, 2048, 1024, 12
LIMIT = 7.0
rng = np.random.default_rng(0)
INTERP = args.interpret


def fp4_stack(out_d, in_d):
    per = []
    for _ in range(L):
        w = rng.standard_normal((E, out_d, in_d)).astype(np.float32) * 0.05
        per.append(quant.quantize_fp4_stack(jnp.asarray(w)))
    return {"q": jnp.stack([c["q"] for c in per]),
            "s": jnp.stack([c["s"] for c in per])}


def int8_stack(out_d, in_d):
    q = rng.integers(-127, 128, (L, E, out_d, in_d), dtype=np.int8)
    s = rng.uniform(0.001, 0.01, (L, E, out_d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(s)


w1, w3, w2 = fp4_stack(I, D), fp4_stack(I, D), fp4_stack(D, I)
perm = pfp4.perm13_rows(I)
w1p = {"q": w1["q"][:, :, perm], "s": w1["s"][:, :, perm]}
w3p = {"q": w3["q"][:, :, perm], "s": w3["s"][:, :, perm]}
q81, s81 = int8_stack(I, D)
q83, s83 = int8_stack(I, D)
q82, s82 = int8_stack(D, I)
idx = jnp.asarray(rng.integers(0, E, M), jnp.int32)
x0 = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))

# weight bytes per step (packed): 2*(I*D/2) + D*I/2 per row gathered; the
# chain streams M rows x L layers
fp4_bytes = L * M * (2 * I * (D // 2) + D * (I // 2))
int8_bytes = 2 * fp4_bytes


def chain_of(layer_fn, weights):
    # weights ride as jit ARGUMENTS — a closure capture would inline the
    # multi-GB stacks as compile-time constants (measured: 2.4 GB
    # captured, compile minutes-long)
    @jax.jit
    def step(x, w):
        def body(carry, li):
            y = layer_fn(carry, li, w)
            # renormalize so the dependent chain can't over/underflow
            y = y / (jnp.max(jnp.abs(y)) + 1e-3)
            return y.astype(jnp.float32), ()

        out, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return out

    return lambda x: step(x, weights)


def l_int8(x, li, w):
    q1, q3, q2, s1, s3, s2 = w
    return pfp4.moe_int8_chain(x, q1, q3, q2, s1, s3, s2, idx,
                               limit=LIMIT, interpret=INTERP, layer=li)


def l_fp4_3call(x, li, w):
    a, b, c = w

    def gemv(xr, wc):
        return pfp4.moe_fp4_gemv(xr, wc["q"], wc["s"], idx,
                                 interpret=INTERP, layer=li)

    g = jnp.minimum(gemv(x, a), LIMIT)
    u = jnp.clip(gemv(x, b), -LIMIT, LIMIT)
    act = jax.nn.sigmoid(g) * g * u
    return gemv(act, c)


def l_fp4_chain(x, li, w):
    a, b, c = w
    return pfp4.moe_fp4_chain(x, a["q"], a["s"], b["q"], b["s"],
                              c["q"], c["s"], idx, limit=LIMIT,
                              interpret=INTERP, layer=li)


def l_fp4_chain_p13(x, li, w):
    a, b, c = w
    return pfp4.moe_fp4_chain(x, a["q"], a["s"], b["q"], b["s"],
                              c["q"], c["s"], idx, limit=LIMIT,
                              interpret=INTERP, layer=li, perm13=True)


VARIANTS = [
    ("int8-chain", l_int8, (q81, q83, q82, s81, s83, s82), int8_bytes),
    ("fp4-3call", l_fp4_3call, (w1, w3, w2), fp4_bytes),
    ("fp4-chain", l_fp4_chain, (w1, w3, w2), fp4_bytes),
    ("fp4-chain-p13", l_fp4_chain_p13, (w1p, w3p, w2), fp4_bytes),
]

outs = {}
for name, fn, weights, nbytes in VARIANTS:
    step = chain_of(fn, weights)
    out = step(x0)
    outs[name] = np.asarray(out)
    iters = 1 if args.interpret else args.iters
    reps = 1 if args.interpret else args.reps
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = x0
        for _ in range(iters):
            o = step(o)
        np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    gbs = nbytes / best / 1e9
    print(f"{name:14s}  {best*1e3:8.3f} ms / {L}-layer step   "
          f"{best*1e3/L:6.3f} ms/layer   {gbs:6.1f} GB/s packed")

np.testing.assert_array_equal(outs["fp4-chain"], outs["fp4-chain-p13"])
print("parity: fp4-chain == fp4-chain-p13 (bit-equal through the "
      f"{L}-layer chain)")
