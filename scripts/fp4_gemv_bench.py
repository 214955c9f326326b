"""On-chip microbench: fused FP4 dequant-GEMV vs XLA gather-dequant forms.

The decode routed-expert chain at REAL DSv4-Flash shapes (256 experts,
I=2048, D=4096, top-6 of bs<=2 → M=12 gathered rows): w1 + w3 GEMVs,
SwiGLU, w2 GEMV. Forms:

- xla_f32:  round-2 production — gather_dequant to f32 + einsum
- xla_bf16: bf16 gather-dequant + bf16 einsum (halved materialization)
- pallas:   ops/pallas/fp4_gemm.moe_fp4_gemv — packed bytes straight to
            VMEM, dequant on the VPU, MXU dot (weights cross HBM once,
            as 4 bits/param)

VERDICT r2 #2 done-criterion: pallas ≥ 1.5x the bf16 XLA form, bytes/step
∝ fp4. Run: python scripts/fp4_gemv_bench.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from pegainfer_tpu.ops import quant
from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

print("backend:", jax.default_backend(), flush=True)

E, I, D = 256, 2048, 4096  # DSv4-Flash expert dims (config.rs:82-244)
M = 12  # bs=2 decode x top-6
ITERS = 20

rng = np.random.default_rng(0)


def make_stack_fast(out_d, in_d):
    # random packed bytes + pow2 scales — bandwidth study, values don't matter
    q = rng.integers(0, 256, (E, out_d, in_d // 2), dtype=np.uint8)
    s = np.exp2(rng.integers(-8, 0, (E, out_d, in_d // 32))).astype(np.float32)
    return {"q": jnp.asarray(q), "s": jnp.asarray(s, quant.SCALE_DTYPE)}


w1 = make_stack_fast(I, D)
w3 = make_stack_fast(I, D)
w2 = make_stack_fast(D, I)
x = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
idx_all = jnp.asarray(rng.integers(0, E, (ITERS, M)), jnp.int32)


def swiglu(g, u, limit=7.0):
    g = jnp.minimum(g, limit)
    u = jnp.clip(u, -limit, limit)
    return jax.nn.sigmoid(g) * g * u


def chain_xla(ws, x_, idx, dtype):
    w1_, w2_, w3_ = ws
    w1g = quant.gather_dequant(w1_, idx, dtype)
    w3g = quant.gather_dequant(w3_, idx, dtype)
    xb = x_.astype(dtype)
    ge = jnp.einsum("md,mid->mi", xb, w1g, preferred_element_type=jnp.float32)
    ue = jnp.einsum("md,mid->mi", xb, w3g, preferred_element_type=jnp.float32)
    act = swiglu(ge, ue)
    w2g = quant.gather_dequant(w2_, idx, dtype)
    return jnp.einsum("mi,mdi->md", act.astype(dtype), w2g,
                      preferred_element_type=jnp.float32)


def chain_pallas(ws, x_, idx, decode="swar"):
    w1_, w2_, w3_ = ws
    ge = pfp4.moe_fp4_gemv(x_, w1_["q"], w1_["s"], idx, decode=decode)
    ue = pfp4.moe_fp4_gemv(x_, w3_["q"], w3_["s"], idx, decode=decode)
    act = swiglu(ge, ue)
    return pfp4.moe_fp4_gemv(act, w2_["q"], w2_["s"], idx, decode=decode)


def loop(fn):
    # weights THREADED as arguments (closure capture would bake 3.6 GB of
    # constants into the program — the repo-wide ModelRuntime rule)
    @jax.jit
    def run(ws, x_, idxs):
        def body(acc, idx):
            return acc + fn(ws, x_, idx)[:, :D].sum(), None
        acc, _ = jax.lax.scan(lambda a, i: body(a, i), 0.0, idxs)
        return acc
    return run


packed_bytes = M * (I * D // 2 * 2 + D * I // 2) + M * (I * D // 32 + I * D // 32 + D * I // 32)
print(f"packed expert bytes/iter: {packed_bytes/2**20:.0f} MiB", flush=True)

results = {}
import os
FORMS = [
    ("pallas_swar", lambda ws, x_, idx: chain_pallas(ws, x_, idx, "swar")),
    ("pallas_arith", lambda ws, x_, idx: chain_pallas(ws, x_, idx, "arith")),
]
if os.environ.get("PEGAINFER_FP4_BENCH_XLA") == "1":  # 2860 ms/iter — opt-in
    FORMS += [
        ("xla_bf16", lambda ws, x_, idx: chain_xla(ws, x_, idx, jnp.bfloat16)),
        ("xla_f32", lambda ws, x_, idx: chain_xla(ws, x_, idx, jnp.float32)),
    ]
for name, fn in FORMS:
    run = loop(fn)
    ws = (w1, w2, w3)
    t0 = time.time()
    np.asarray(run(ws, x, idx_all))  # compile + 1st run
    print(f"{name}: compiled in {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(ws, x, idx_all))
        best = min(best, (time.time() - t0) / ITERS)
    gbs = packed_bytes / best / 1e9
    results[name] = best
    print(f"{name}: {best*1e3:.3f} ms/iter  ({gbs:.0f} GB/s on packed bytes)",
          flush=True)

if "xla_bf16" in results:
    print(f"\nspeedup swar vs xla_bf16: {results['xla_bf16']/results['pallas_swar']:.2f}x")
print(f"speedup swar vs arith: {results['pallas_arith']/results['pallas_swar']:.2f}x")

# ── prefill-scale grouped GEMM (moe_fp4_grouped) ─────────────────────────
# one full routed-MoE layer chain at chunk scale: T=2048 tokens x top-6
Mp, TM = 2048 * 6, 128
x_p = jnp.asarray(rng.standard_normal((Mp, D)).astype(np.float32), jnp.bfloat16)
flat_e = jnp.sort(jnp.asarray(rng.integers(0, E, Mp), jnp.int32))
seg = pfp4.tile_segments(flat_e, TM, E)
stack_bytes = E * (2 * (I * D // 2 + I * D // 32) + (D * I // 2 + D * I // 32))


@jax.jit
def grouped_chain(ws, xp, se, lo, hi, ns):
    w1_, w2_, w3_ = ws
    ge = pfp4.moe_fp4_grouped(xp, w1_["q"], w1_["s"], se, lo, hi, ns, tm=TM)
    ue = pfp4.moe_fp4_grouped(xp, w3_["q"], w3_["s"], se, lo, hi, ns, tm=TM)
    act = swiglu(ge, ue)
    out = pfp4.moe_fp4_grouped(act.astype(jnp.bfloat16), w2_["q"], w2_["s"],
                               se, lo, hi, ns, tm=TM)
    # scalar reduce ON DEVICE: materializing [M, D] f32 to numpy ships
    # 200 MB over the tunnel (~6.6 s) and swamps the measurement
    return out.sum()


t0 = time.time()
np.asarray(grouped_chain((w1, w2, w3), x_p, *seg))
print(f"grouped(T=2048,K=6): compiled in {time.time()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.time()
    np.asarray(grouped_chain((w1, w2, w3), x_p, *seg))
    best = min(best, time.time() - t0)
print(f"grouped prefill chain: {best*1e3:.1f} ms/layer-chunk "
      f"({stack_bytes/best/1e9:.0f} GB/s on the packed stack; "
      f"floor = stack once)", flush=True)
