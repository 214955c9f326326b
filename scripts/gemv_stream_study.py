"""Weight-streaming bandwidth study: manual Pallas DMA pipeline vs XLA.

VERDICT #2 / docs/PERF.md roadmap #3: the bf16 decode step is bound by
streaming ~6.8 GB of weights per token. XLA's fused step measures ~570 GB/s
effective; the open question is whether a hand-built Pallas pipeline with
deeper buffering can push closer to the chip's raw HBM bandwidth, which
would translate directly into decode TPOT.

Measurements (all CHAINED 10 deep inside one jit — a lone dispatch is
dominated by the ~1.8 ms dispatch overhead on this link and reads out as
~70 GB/s regardless of the op):
  stream — pure HBM->VMEM DMA pipeline (nbuf deep) + trivial reduce: the
           achievable *read* ceiling for a Pallas kernel.
  gemv   — the same pipeline feeding the MXU: y[1,N] = x[1,K] @ W.T with
           W [N, K] row-major (streaming-friendly layout).
  xla    — x @ W2 on the engine's actual [K, N] layout, and dot(W, x) on
           the study layout.

Run (TPU): python scripts/gemv_stream_study.py
CPU check: python scripts/gemv_stream_study.py --interpret
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

CHAIN = 10


def make_stream_sum(N, K, ck, nbuf, interpret=False):
    """(W [N,K] bf16, s [1,1] f32) -> [1,1] f32: sum(W) + s, W streamed in
    [ck, K] chunks through an nbuf-deep VMEM pipeline. The s input chains
    calls data-dependently so a timing loop can't be CSE'd."""
    nchunks = N // ck
    assert N % ck == 0

    def kernel(w_hbm, s_ref, out_ref):
        def body(scratch, sem):
            def get(slot, i):
                return pltpu.make_async_copy(
                    w_hbm.at[pl.ds(i * ck, ck), :],
                    scratch.at[slot],
                    sem.at[slot],
                )

            for s in range(min(nbuf - 1, nchunks)):
                get(s, s).start()

            def loop(i, acc):
                slot = i % nbuf
                pre = i + nbuf - 1
                @pl.when(pre < nchunks)
                def _():
                    get(pre % nbuf, pre).start()
                get(slot, i).wait()
                return acc + jnp.sum(scratch[slot].astype(jnp.float32))

            acc = jax.lax.fori_loop(0, nchunks, loop, jnp.float32(0))
            out_ref[:] = jnp.full((1, 1), acc, jnp.float32) + s_ref[:]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((nbuf, ck, K), jnp.bfloat16),
            sem=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def make_gemv(N, K, ck, nbuf, interpret=False):
    """(x [1,K] bf16, W [N,K] bf16, s [1,1] f32) -> y [1, N] f32:
    y = x @ W.T + s, W streamed row-major in [ck, K] chunks."""
    nchunks = N // ck
    assert N % ck == 0

    def kernel(x_ref, w_hbm, s_ref, out_ref):
        def body(scratch, sem):
            def get(slot, i):
                return pltpu.make_async_copy(
                    w_hbm.at[pl.ds(i * ck, ck), :],
                    scratch.at[slot],
                    sem.at[slot],
                )

            for s in range(min(nbuf - 1, nchunks)):
                get(s, s).start()
            xv = x_ref[:]  # [1, K]
            sv = s_ref[0, 0]

            def loop(i, _):
                slot = i % nbuf
                pre = i + nbuf - 1
                @pl.when(pre < nchunks)
                def _():
                    get(pre % nbuf, pre).start()
                get(slot, i).wait()
                # [1, K] @ [ck, K]^T -> [1, ck]
                part = jax.lax.dot_general(
                    xv, scratch[slot],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_ref[:, pl.ds(i * ck, ck)] = part + sv
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def bench(fn, *args, reps=5):
    out = fn(*args)  # compile
    jax.tree.map(np.asarray, out)  # materialize (block_until_ready lies here)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        shapes = [(1024, 256)]
        chunks = [128]
        nbufs = [2, 4]
        global CHAIN
        CHAIN = 2
    else:
        compile_cache.enable()
        # gate_up-like, lm_head-like, qkv-like
        shapes = [(19456, 2560), (151936, 2560), (6144, 2560)]
        chunks = [256, 512, 1024]
        nbufs = [2, 4, 8]
    print(f"backend={jax.default_backend()} chain={CHAIN}", flush=True)

    for N, K in shapes:
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.standard_normal((N, K)) * 0.05, jnp.bfloat16)
        W2 = jnp.asarray(np.asarray(W, np.float32).T, jnp.bfloat16)  # [K, N]
        x = jnp.asarray(rng.standard_normal((1, K)) * 0.05, jnp.bfloat16)
        nbytes = N * K * 2
        print(f"\n== W [{N}, {K}] bf16 = {nbytes / 2**20:.0f} MiB", flush=True)

        # XLA baselines, chained with x-feedback to defeat CSE
        @jax.jit
        def xla_engine_layout(x, w2):
            def body(i, xc):
                y = (xc @ w2).astype(jnp.float32)  # [1, N]
                return xc + (y[:, :1] * 1e-30).astype(xc.dtype)
            return jax.lax.fori_loop(0, CHAIN, body, x)

        @jax.jit
        def xla_study_layout(x, w):
            def body(i, xc):
                y = jax.lax.dot_general(
                    xc, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return xc + (y[:, :1] * 1e-30).astype(xc.dtype)
            return jax.lax.fori_loop(0, CHAIN, body, x)

        for name, fn, a in (("xla x@W[K,N] ", xla_engine_layout, (x, W2)),
                            ("xla dot(W,x) ", xla_study_layout, (x, W))):
            try:
                t = bench(fn, *a, reps=args.reps) / CHAIN
                print(f"  {name}      : {t * 1e3:7.2f} ms  "
                      f"{nbytes / t / 1e9:6.1f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                      flush=True)

        for ck in chunks:
            if N % ck:
                continue
            for nb in nbufs:
                if ck * K * 2 * nb > 14 * 2**20:
                    continue
                try:
                    inner = make_stream_sum(N, K, ck, nb,
                                            interpret=args.interpret)

                    @jax.jit
                    def chained_stream(w, s0, inner=inner):
                        return jax.lax.fori_loop(
                            0, CHAIN, lambda i, s: inner(w, s) * 1e-30, s0)

                    s0 = jnp.zeros((1, 1), jnp.float32)
                    t = bench(chained_stream, W, s0, reps=args.reps) / CHAIN
                    print(f"  stream ck={ck:5d} nb={nb}: {t * 1e3:7.2f} ms  "
                          f"{nbytes / t / 1e9:6.1f} GB/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  stream ck={ck:5d} nb={nb}: FAIL "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                try:
                    g = make_gemv(N, K, ck, nb, interpret=args.interpret)
                    # correctness spot check (single call, s = 0)
                    s0 = jnp.zeros((1, 1), jnp.float32)
                    got = np.asarray(jax.jit(g)(x, W, s0))
                    want = np.asarray(
                        jax.lax.dot_general(
                            x, W, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32))
                    err = np.abs(got - want).max() / max(
                        np.abs(want).max(), 1e-6)

                    @jax.jit
                    def chained_gemv(x, w, s0, g=g):
                        def body(i, s):
                            y = g(x, w, s)
                            return y[:, :1] * 1e-30
                        return jax.lax.fori_loop(0, CHAIN, body, s0)

                    t = bench(chained_gemv, x, W, s0, reps=args.reps) / CHAIN
                    print(f"  gemv   ck={ck:5d} nb={nb}: {t * 1e3:7.2f} ms  "
                          f"{nbytes / t / 1e9:6.1f} GB/s  (relerr {err:.2e})",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  gemv   ck={ck:5d} nb={nb}: FAIL "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
