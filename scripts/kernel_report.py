"""Per-op decode-step kernel report on the real chip.

Reference analog: the CUPTI-driven `qwen3_kernel_report` /
`kernel_bench.rs` per-op tables (pegainfer-qwen3-4b/src/kernel_bench.rs,
docs/subsystems/kernels/kernel-op-reports.md). Here each op is timed as
its own jitted program (np.asarray sync; ~1.8 ms dispatch overhead is
reported alongside so per-op numbers can be read as device time + fixed
cost).

Run: ``python scripts/kernel_report.py [--model qwen3|qwen35] [--ctx 1024]``
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from pegainfer_tpu.utils.compile_cache import enable  # noqa: E402

enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def nbytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


# Roofline denominators (docs/PERF.md round-2 revision): the v5e HBM
# datasheet 819 GB/s — real-shape XLA GEMM chains measure ~650 GB/s (79%)
# and the full decode step ~657 effective. The roofline column is the
# CUPTI-hw-counter analog: achieved fraction of attainable memory BW.
# CAUTION: isolated small ops (<1 GB) are dominated by the ~0.7-1.8 ms
# dispatch floor; their roofline numbers only make sense in-program.
CEIL_READ_GB_S = 819.0
CEIL_RW_GB_S = 819.0


def row(name, ms, gb, ceiling=CEIL_READ_GB_S):
    eff = gb / (ms / 1e3) if ms > 0 else 0.0
    pct = 100.0 * eff / ceiling
    print(f"{name:<34} {ms:8.3f} ms {gb:8.3f} GB {eff:8.0f} GB/s "
          f"{pct:5.1f}% roofline", flush=True)


def report_qwen3(ctx: int):
    from pegainfer_tpu.models import qwen3 as q3

    cfg = q3.Qwen3Config(
        hidden_size=2560, intermediate_size=9728, num_hidden_layers=36,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        vocab_size=151936, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, max_position_embeddings=40960,
    )
    params = q3.init_bench_params(cfg)
    B, ps = 1, 64
    num_pages = max(512, 2 * (ctx // ps))
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    lw = params["layers"]

    x = jnp.full((B, D), 0.01, jnp.bfloat16)

    # one layer's GEMM stack (qkv + o + mlp), all layers' worth of bytes
    def layer_gemms(params, x):
        def body(x, lw):
            q = x @ lw["wq"]; k = x @ lw["wk"]; v = x @ lw["wv"]
            o = (q[:, :D] + k[:, :D // 2].sum() + v[:, :1]) @ lw["wo"][:D].T
            h = x + o[:, :D]
            gu = h @ lw["w_gate_up"]
            g, u = jnp.split(gu, 2, -1)
            return h + (jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u) @ lw["w_down"], None
        y, _ = jax.lax.scan(body, x, params["layers"])
        return y

    gemm_gb = nbytes(
        {k: lw[k] for k in ("wq", "wk", "wv", "wo", "w_gate_up", "w_down")}
    ) / 1e9
    ms = timeit(jax.jit(layer_gemms), params, x)
    row("36-layer GEMM stack (approx)", ms, gemm_gb)

    # attention (pallas full pool) across all layers
    from pegainfer_tpu.ops.pallas import paged_attention_decode

    kv = q3.make_kv_pages(cfg, num_pages, ps)
    P = max(8, -(-ctx // ps))
    pw = 8
    while pw < P:
        pw *= 2
    tables = jnp.broadcast_to(jnp.arange(1, pw + 1, dtype=jnp.int32)[None], (B, pw))
    sl = jnp.full((B,), ctx, jnp.int32)
    qh = jnp.full((B, cfg.num_attention_heads, cfg.head_dim), 0.01, jnp.bfloat16)
    ck = jnp.full((B, cfg.num_key_value_heads, cfg.head_dim), 0.01, jnp.bfloat16)

    def attn_all(kv, qh, ck):
        def body(acc, li):
            o = paged_attention_decode(qh, kv, kv, tables, sl,
                                       cfg.head_dim ** -0.5, cur_k=ck,
                                       cur_v=ck, layer_id=li)
            return acc + jnp.sum(o.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(L, dtype=jnp.int32))
        return acc

    kv_gb = ctx * L * 2 * cfg.num_key_value_heads * cfg.head_dim * 2 * B / 1e9
    ms = timeit(jax.jit(attn_all), kv, qh, ck)
    row(f"paged attention x36 @ctx={ctx}", ms, kv_gb)

    # lm_head
    def head(params, x):
        return jnp.sum((x @ params["lm_head"]).astype(jnp.float32))

    ms = timeit(jax.jit(head), params, x)
    row("lm_head GEMV", ms, nbytes(params["lm_head"]) / 1e9)

    # pend flush (dus chain) — REUSE the attention section's pool (three
    # 4.8 GB pools + 8 GB params would exhaust HBM)
    pend = q3.make_pend(cfg, B)
    flush = jax.jit(q3.flush_pend, donate_argnums=0)
    kvf = kv
    out = flush(kvf, pend, jnp.ones((B,), bool))
    _ = np.asarray(out[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(20):
        out = flush(out, pend, jnp.ones((B,), bool))
    _ = np.asarray(out[0, 0, 0, 0, 0])
    row("pend flush (dus chain)", (time.perf_counter() - t0) / 20 * 1e3,
        nbytes(pend) / 1e9, ceiling=CEIL_RW_GB_S)

    # full wa step
    tables_f = jnp.broadcast_to(
        jnp.arange(1, pw + 1, dtype=jnp.int32)[None], (B, pw))

    def step(params, kv, pend, tok):
        pos = jnp.full((B,), ctx, jnp.int32)
        kv, pend, logits = q3.decode_wa(cfg, params, kv, pend, tok, pos,
                                        tables_f, pos + 1, use_pallas=True)
        return kv, pend, jnp.argmax(logits, -1).astype(jnp.int32)

    jl = jax.jit(step, donate_argnums=(1, 2))
    kv2 = out  # the flushed pool from the previous section (same geometry)
    pend2 = q3.make_pend(cfg, B)
    tok = jnp.zeros(B, jnp.int32)
    kv2, pend2, out = jl(params, kv2, pend2, tok)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(20):
        kv2, pend2, out = jl(params, kv2, pend2, out)
    _ = np.asarray(out)
    total_gb = nbytes(params) / 1e9 + kv_gb
    row("FULL decode_wa step", (time.perf_counter() - t0) / 20 * 1e3, total_gb)


def report_qwen35(ctx: int):
    from pegainfer_tpu.models import qwen35 as q35
    from pegainfer_tpu.ops import gdn

    cfg = q35.bench_config()
    params = q35.init_bench_params(cfg)
    B, ps = 1, 64
    D = cfg.hidden_size
    x = jnp.full((B, D), 0.01, jnp.bfloat16)

    # GDN linear-layer projection GEMMs (wq..wz + out + mlp) x 24
    lin = params["lin"]
    def lin_gemms(params, x):
        def body(x, lin_g):
            for j in range(cfg.period - 1):
                lw = jax.tree.map(lambda a: a[j], lin_g)
                q = x @ lw["wq"]; k = x @ lw["wk"]; v = x @ lw["wv"]
                z = x @ lw["wz"]
                o = (v + z) @ lw["out_proj"]
                h = x + o
                gu = h @ lw["mlp_gate_up"]
                g, u = jnp.split(gu, 2, -1)
                x = h + (jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u) @ lw["mlp_down"]
                x = x + jnp.sum(q + k) * 0
            return x, None
        y, _ = jax.lax.scan(body, x, params["lin"])
        return y

    gb = nbytes({k: lin[k] for k in ("wq", "wk", "wv", "wz", "out_proj",
                                     "mlp_gate_up", "mlp_down")}) / 1e9
    ms = timeit(jax.jit(lin_gemms), params, x)
    row("24 linear-layer GEMMs (approx)", ms, gb)

    # GDN state update x24 (step recurrence on [B, Hv, dk, dv] rows)
    Hv, dk, dv = (cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                  cfg.linear_value_head_dim)
    S0 = jnp.zeros((24, B, Hv, dk, dv), jnp.float32)
    qv = jnp.full((B, Hv, dk), 0.01, jnp.float32)
    g = jnp.full((B, Hv), -0.1, jnp.float32)
    beta = jnp.full((B, Hv), 0.5, jnp.float32)
    vv = jnp.full((B, Hv, dv), 0.01, jnp.float32)

    def gdn_all(S0, qv, vv, g, beta):
        def body(acc, S):
            out, S2 = gdn.gdn_step(qv, qv, vv, g, beta, S)
            return acc + jnp.sum(out) + jnp.sum(S2) * 0, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), S0)
        return acc

    ms = timeit(jax.jit(gdn_all), S0, qv, vv, g, beta)
    row("GDN step x24 (state rows)", ms, nbytes(S0) / 1e9 * 2,
        ceiling=CEIL_RW_GB_S)

    # full-attention layers x8: GEMMs dominate
    full = params["full"]
    gbf = nbytes({k: full[k] for k in ("wq", "wgate", "wk", "wv", "wo",
                                       "mlp_gate_up", "mlp_down")}) / 1e9
    def full_gemms(params, x):
        def body(x, fw):
            q = x @ fw["wq"]; gt = x @ fw["wgate"]
            k = x @ fw["wk"]; v = x @ fw["wv"]
            o = (q * jax.nn.sigmoid(gt.astype(jnp.float32)).astype(q.dtype)) @ fw["wo"]
            h = x + o + jnp.sum(k + v) * 0
            gu = h @ fw["mlp_gate_up"]
            g2, u = jnp.split(gu, 2, -1)
            return h + (jax.nn.silu(g2.astype(jnp.float32)).astype(h.dtype) * u) @ fw["mlp_down"], None
        y, _ = jax.lax.scan(body, x, params["full"])
        return y

    ms = timeit(jax.jit(full_gemms), params, x)
    row("8 full-layer GEMMs (approx)", ms, gbf)

    def head(params, x):
        return jnp.sum((x @ params["lm_head"]).astype(jnp.float32))

    ms = timeit(jax.jit(head), params, x)
    row("lm_head GEMV", ms, nbytes(params["lm_head"]) / 1e9)

    # full wa decode step through the model
    num_pages = max(256, 2 * (ctx // ps))
    state = q35.make_state(cfg, num_pages, ps, max_slots=8)
    pend = q35.make_pend(cfg, B, 8)
    P = 8
    while P * ps < ctx + 8:
        P *= 2
    tables = jnp.broadcast_to(jnp.arange(1, P + 1, dtype=jnp.int32)[None], (B, P))

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
    row("FULL decode_wa step", (time.perf_counter() - t0) / 20 * 1e3,
        nbytes(params) / 1e9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen3", choices=["qwen3", "qwen35"])
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()
    print(f"kernel report: {args.model} ctx={args.ctx} "
          f"(dispatch overhead ~1.8 ms included per row)", flush=True)
    if args.model == "qwen3":
        report_qwen3(args.ctx)
    else:
        report_qwen35(args.ctx)


if __name__ == "__main__":
    main()
