"""Qwen3.5 decode: split vs fused projection layouts, measured properly.

kernel_report shows the 24 linear-layer GEMM chain at ~242 GB/s — the
decode bottleneck (14 of the 15.9 ms TPOT). The fused layout (one GEMM
per projection site) was recorded as "neutral-to-worse" at engine level
in round 1, contradicting the kernel-level 250-vs-370 GB/s note. This
re-measures both layouts on (a) the bare lin-layer chain and (b) the full
write-ahead decode step, same weights, 20 reps, donated state.

Run: python scripts/qwen35_fused_probe.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from pegainfer_tpu.models import qwen35 as q35

print("backend:", jax.default_backend(), flush=True)
cfg = q35.bench_config()
B, ps, ctx = 1, 64, 1024
num_pages = 64


def step_time(params, label):
    state = q35.make_state(cfg, num_pages, ps, max_slots=8)
    pend = q35.make_pend(cfg, B, 8)
    P = 32
    tables = jnp.broadcast_to(
        jnp.arange(1, P + 1, dtype=jnp.int32)[None], (B, P))

    def step(params, state, pend, tok):
        pos = jnp.full((B,), ctx, jnp.int32)
        st, pend2, logits = q35.decode_wa(
            cfg, params, state, pend, tok, pos, tables, pos + 1,
            jnp.zeros((B,), jnp.int32), use_pallas=True)
        return st, pend2, jnp.argmax(logits, -1).astype(jnp.int32)

    jl = jax.jit(step, donate_argnums=(1, 2))
    tok = jnp.zeros(B, jnp.int32)
    state, pend, out = jl(params, state, pend, tok)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(20):
        state, pend, out = jl(params, state, pend, out)
    _ = np.asarray(out)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{label:<28} FULL step: {ms:7.2f} ms", flush=True)
    return ms


split_params = q35.init_bench_params(cfg)
fused_params = q35.fuse_params(q35.init_bench_params(cfg))

a = step_time(split_params, "split projections")
b = step_time(fused_params, "fused qkvzba/qgkv")
print(f"fused/split: {b / a:.3f}x", flush=True)


# ── ablation: what does the GDN math itself cost inside the step? ──
from pegainfer_tpu.ops import gdn as gdn_mod

orig_step, orig_conv = gdn_mod.gdn_step, gdn_mod.causal_conv1d_step
try:
    gdn_mod.gdn_step = lambda q, k, v, g, b, S: (v, S)
    gdn_mod.causal_conv1d_step = lambda mixed, w, st: (mixed, st)
    c = step_time(split_params, "split, GDN ops = identity")
finally:
    gdn_mod.gdn_step, gdn_mod.causal_conv1d_step = orig_step, orig_conv
print(f"GDN math cost inside step: {a - c:.2f} ms", flush=True)

# ── ablation: attention off too (isolates pure projection+mlp chain) ──
from pegainfer_tpu.ops import attention as att_mod
from pegainfer_tpu.ops import pallas as pallas_mod

orig_pallas_att = pallas_mod.paged_attention_decode
try:
    gdn_mod.gdn_step = lambda q, k, v, g, b, S: (v, S)
    gdn_mod.causal_conv1d_step = lambda mixed, w, st: (mixed, st)
    pallas_mod.paged_attention_decode = (
        lambda q, *a_, **k_: jnp.zeros_like(q))
    d = step_time(split_params, "…and attention = zeros")
finally:
    gdn_mod.gdn_step, gdn_mod.causal_conv1d_step = orig_step, orig_conv
    pallas_mod.paged_attention_decode = orig_pallas_att
print(f"attention cost inside step: {c - d:.2f} ms", flush=True)


# ── fused + GDN-off: does fusion show once GDN stops serializing? ──
try:
    gdn_mod.gdn_step = lambda q, k, v, g, b, S: (v, S)
    gdn_mod.causal_conv1d_step = lambda mixed, w, st: (mixed, st)
    e = step_time(fused_params, "fused, GDN ops = identity")
finally:
    gdn_mod.gdn_step, gdn_mod.causal_conv1d_step = orig_step, orig_conv
print(f"fused+GDNoff vs split+GDNoff: {e / c:.3f}x", flush=True)
