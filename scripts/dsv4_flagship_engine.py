"""DSv4 FLAGSHIP-width ENGINE drive: the full serving stack (scheduler +
executor + prefill/decode through ModelRuntime) at the real per-layer
geometry — 3 layers, one per attention class (window / ratio-128 / ratio-4
indexer), 256 experts top-6, quantized-resident with the fused kernels.

Complements scripts/dsv4_flagship_probe.py (raw decode/prefill chains):
this proves the ENGINE path — admission, chunked prefill, async decode
blocks, on-device sampling — runs at flagship widths on one chip, and
reports TTFT/TPOT through the real request loop.

Run: python scripts/dsv4_flagship_engine.py [--prompt 1024 --decode 64]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=int, default=1024)
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--experts", type=int, default=256)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pegainfer_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    from dsv4_flagship_probe import flagship_cfg, rand_params, note
    from pegainfer_tpu.engine.contract import (
        EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
    )
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler
    from pegainfer_tpu.models import dsv4
    from pegainfer_tpu.models.dsv4_engine import make_runtime

    note(f"backend={jax.default_backend()}")
    # one layer per attention class — a heterogeneous 3-segment model at
    # the real widths (the probe measures homogeneous stacks)
    base = flagship_cfg(0, 3, n_experts=args.experts)
    cfg = dsv4.DSv4Config(**{
        **{f.name: getattr(base, f.name) for f in
           __import__("dataclasses").fields(base)},
        "compress_ratios": (0, 128, 4),
    })
    # rand_params builds ONE stacked segment; build per-ratio segments
    import dsv4_flagship_probe as probe

    rng = np.random.default_rng(0)
    segs = []
    for r in (0, 128, 4):
        c1 = flagship_cfg(r, 1, n_experts=args.experts)
        segs.append(probe.rand_segment(c1, rng, bf16_experts=False))
    params = {k: v for k, v in probe.rand_params(
        flagship_cfg(0, 1, n_experts=args.experts),
        bf16_experts=False).items() if k != "segments"}
    params["segments"] = segs
    note("flagship 3-class params built")

    on_tpu = jax.default_backend() == "tpu"
    modes = dsv4.RunModes(
        fp4_kernel=True if on_tpu else "interpret",
        fp8_kernel=True if on_tpu else "interpret")
    runtime = make_runtime(cfg, params, max_model_len=2048, max_slots=2,
                           modes=modes)
    handle = start_scheduler(JaxExecutor(runtime, EngineLoadOptions()))
    note("engine up")

    prompt = rng.integers(0, cfg.vocab_size, args.prompt).tolist()
    req = GenerateRequest(prompt_tokens=prompt, max_tokens=args.decode,
                          params=SamplingParams(ignore_eos=True))
    t0 = time.perf_counter()
    handle.submit(req)
    ttft, stamps = None, []
    for ev in req.channel:
        now = time.perf_counter()
        if isinstance(ev, Token):
            if ttft is None:
                ttft = (now - t0) * 1e3
            stamps.append(now)
        elif isinstance(ev, Finished):
            break
        else:
            note(f"event: {ev!r}")
    if ttft is None:
        note("warm request produced NO tokens — see events above")
        sys.exit(2)
    note(f"warm request: TTFT {ttft:.1f} ms (includes compiles)")

    req2 = GenerateRequest(prompt_tokens=rng.integers(
        0, cfg.vocab_size, args.prompt).tolist(), max_tokens=args.decode,
        params=SamplingParams(ignore_eos=True))
    t0 = time.perf_counter()
    handle.submit(req2)
    ttft2, stamps2 = None, []
    for ev in req2.channel:
        now = time.perf_counter()
        if isinstance(ev, Token):
            if ttft2 is None:
                ttft2 = (now - t0) * 1e3
            stamps2.append(now)
        elif isinstance(ev, Finished):
            break
    handle.shutdown()
    k = 1
    tpot = (stamps2[-1] - stamps2[k]) * 1e3 / (len(stamps2) - 1 - k)
    print({"flagship_engine_3class": {
        "prompt": args.prompt, "decode": args.decode,
        "ttft_ms": round(ttft2, 1), "tpot_ms": round(tpot, 3),
        "tokens": len(stamps2)}}, flush=True)


if __name__ == "__main__":
    main()
