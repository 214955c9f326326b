"""Decode-skeleton study: 36-layer dependent GEMV chain, XLA vs Pallas.

Follow-up to gemv_stream_study.py, whose single-op chains were dominated
by a ~0.75 ms per-iteration floor (XLA and Pallas alike). The shape that
matters is the real decode structure: L dependent weight-streaming GEMVs
(layer l+1's input is layer l's output). Three implementations over the
SAME [L, N, K] bf16 stack:

  xla-scan     — lax.scan of dot over the stacked weights (what the
                 engine's jitted step essentially becomes after fusion).
  pallas-scan  — lax.scan of a per-layer Pallas DMA-pipelined GEMV kernel
                 (full-stack operand + layer scalar, no scan-xs slicing).
  pallas-mega  — ONE Pallas kernel streaming the whole stack: a flat
                 chunk loop crosses layer boundaries, so the DMA pipeline
                 never drains between layers. This is the roadmap-#3
                 "fused decode-layer weight-streaming kernel" candidate.

Per-layer GB/s directly converts to decode TPOT: the bf16 engine streams
~6.8 GB/token, so 590 GB/s = 11.5 ms, 700 GB/s = 9.7 ms.

Run (TPU): python scripts/gemv_chain_study.py
CPU check: python scripts/gemv_chain_study.py --interpret
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

from pegainfer_tpu.utils import compile_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_layer_gemv(L, N, K, ck, nbuf, interpret=False):
    """(x [1,K] bf16, stack [L,N,K] bf16 ANY, l [1] i32 SMEM) -> y [1,N] f32.
    One layer's GEMV; the stack rides whole (no per-layer slice — the
    kernel DMAs stack[l, chunk] directly, the KV-pool-saga rule)."""
    nchunks = N // ck

    def kernel(l_ref, x_ref, stack_hbm, out_ref):
        def body(scratch, sem):
            l = l_ref[0]

            def get(slot, i):
                return pltpu.make_async_copy(
                    stack_hbm.at[l, pl.ds(i * ck, ck), :],
                    scratch.at[slot],
                    sem.at[slot],
                )

            for s in range(min(nbuf - 1, nchunks)):
                get(s, s).start()
            xv = x_ref[:]

            def loop(i, _):
                slot = i % nbuf
                pre = i + nbuf - 1
                @pl.when(pre < nchunks)
                def _():
                    get(pre % nbuf, pre).start()
                get(slot, i).wait()
                part = jax.lax.dot_general(
                    xv, scratch[slot], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[:, pl.ds(i * ck, ck)] = part
                return 0

            jax.lax.fori_loop(0, nchunks, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((nbuf, ck, K), jnp.bfloat16),
            sem=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def make_mega(L, N, K, ck, nbuf, interpret=False):
    """(x [1,K] bf16, stack [L,N,K] bf16 ANY) -> y [1,N] f32 after L
    dependent layers (x_{l+1} = y_l[:, :K]); ONE kernel, flat chunk loop,
    DMA pipeline streams across layer boundaries without draining."""
    nchunks = N // ck
    total = L * nchunks

    def kernel(x_ref, stack_hbm, out_ref):
        def body(xbuf, scratch, sem):
            def get(slot, c):
                return pltpu.make_async_copy(
                    stack_hbm.at[c // nchunks,
                                 pl.ds((c % nchunks) * ck, ck), :],
                    scratch.at[slot],
                    sem.at[slot],
                )

            for s in range(min(nbuf - 1, total)):
                get(s, s).start()
            xbuf[:] = x_ref[:]

            def loop(c, _):
                slot = c % nbuf
                pre = c + nbuf - 1
                @pl.when(pre < total)
                def _():
                    get(pre % nbuf, pre).start()
                get(slot, c).wait()
                i = c % nchunks
                part = jax.lax.dot_general(
                    xbuf[:], scratch[slot], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[:, pl.ds(i * ck, ck)] = part

                # layer boundary: feed y back as the next layer's input.
                # NOTE the next layer's weights were already prefetched —
                # legal, weights don't depend on x.
                @pl.when(i == nchunks - 1)
                def _():
                    xbuf[:] = out_ref[:, :K].astype(jnp.bfloat16)

                return 0

            jax.lax.fori_loop(0, total, loop, 0)

        pl.run_scoped(
            body,
            xbuf=pltpu.VMEM((1, K), jnp.bfloat16),
            scratch=pltpu.VMEM((nbuf, ck, K), jnp.bfloat16),
            sem=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--layers", type=int, default=36)
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        L, N, K = 3, 512, 256
        configs = [(128, 2), (128, 4)]
    else:
        compile_cache.enable()
        L, N, K = args.layers, 19456, 2560
        configs = [(512, 2), (512, 4), (1024, 2), (1024, 4), (2432, 2),
                   (512, 8)]
    print(f"backend={jax.default_backend()} L={L} N={N} K={K}", flush=True)

    rng = np.random.default_rng(0)
    # near-orthonormal-ish scaling keeps the chained activations finite
    stack = jnp.asarray(
        rng.standard_normal((L, N, K)) * (1.0 / np.sqrt(K)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    layer_bytes = N * K * 2
    total_bytes = L * layer_bytes
    print(f"stack = {total_bytes / 2**30:.2f} GiB "
          f"({layer_bytes / 2**20:.0f} MiB/layer)", flush=True)

    @jax.jit
    def xla_scan(x, stack):
        def body(xc, Wl):
            y = jax.lax.dot_general(
                xc, Wl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y[:, :K].astype(jnp.bfloat16), y[:, :1]
        xf, ys = jax.lax.scan(body, x, stack)
        return xf

    t = bench(xla_scan, x, stack, reps=args.reps)
    ref_out = np.asarray(xla_scan(x, stack))
    print(f"  xla-scan           : {t * 1e3:8.2f} ms  "
          f"{total_bytes / t / 1e9:6.1f} GB/s  "
          f"({t * 1e3 / L:.3f} ms/layer)", flush=True)

    for ck, nb in configs:
        if N % ck:
            continue
        if ck * K * 2 * nb > 13 * 2**20:
            continue
        try:
            g = make_layer_gemv(L, N, K, ck, nb, interpret=args.interpret)

            @jax.jit
            def pallas_scan(x, stack, g=g):
                def body(xc, l):
                    y = g(jnp.asarray([l], jnp.int32), xc, stack)
                    return y[:, :K].astype(jnp.bfloat16), None
                xf, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
                return xf

            out = np.asarray(pallas_scan(x, stack))
            err = np.abs(out.astype(np.float32)
                         - ref_out.astype(np.float32)).max()
            t = bench(pallas_scan, x, stack, reps=args.reps)
            print(f"  pallas-scan ck={ck:5d} nb={nb}: {t * 1e3:8.2f} ms  "
                  f"{total_bytes / t / 1e9:6.1f} GB/s  "
                  f"({t * 1e3 / L:.3f} ms/layer, maxdiff {err:.2e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  pallas-scan ck={ck:5d} nb={nb}: FAIL "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        try:
            m = jax.jit(make_mega(L, N, K, ck, nb, interpret=args.interpret))
            out = np.asarray(m(x, stack))[:, :K].astype(jnp.bfloat16)
            err = np.abs(np.asarray(out, np.float32)
                         - ref_out.astype(np.float32)).max()
            t = bench(m, x, stack, reps=args.reps)
            print(f"  pallas-mega ck={ck:5d} nb={nb}: {t * 1e3:8.2f} ms  "
                  f"{total_bytes / t / 1e9:6.1f} GB/s  "
                  f"({t * 1e3 / L:.3f} ms/layer, maxdiff {err:.2e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  pallas-mega ck={ck:5d} nb={nb}: FAIL "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
