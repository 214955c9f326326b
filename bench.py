"""Headline bench: Qwen3-4B BF16 decode TPOT on one chip.

Mirrors the reference's `bench_serving snapshot` decode_heavy config
(prompt 1024 / output 256, greedy, pegainfer-server/src/bin/bench_serving.rs)
through the real engine hot path (JaxExecutor prefill + decode steps).
Weights are random at true Qwen3-4B shapes — identical compute/memory
footprint to the checkpoint, no download needed.

Prints ONE JSON line:
  {"metric": "qwen3_4b_decode_tpot_p50_ms", "value": N, "unit": "ms",
   "vs_baseline": baseline_ms / N}   (>1.0 means faster than the reference's
   RTX 5070 Ti snapshot, bench_snapshots/rtx-5070-ti/qwen3-4b.json).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_T0 = time.time()


def note(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

BASELINE_TPOT_MS = 11.31  # bench_snapshots/rtx-5070-ti/qwen3-4b.json decode_heavy p50
BASELINE_TPOT_MS_QWEN35 = 12.39  # rtx-5070-ti/qwen3.5-4b.json decode_heavy p50


def qwen3_4b_config():
    from pegainfer_tpu.models.qwen3 import Qwen3Config

    return Qwen3Config(
        hidden_size=2560,
        intermediate_size=9728,
        num_hidden_layers=36,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        vocab_size=151936,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        tie_word_embeddings=True,
        eos_token_id=151645,
        stop_token_ids=(151645,),
        max_position_embeddings=40960,
    )


def smoke_config():
    from pegainfer_tpu.models.qwen3 import Qwen3Config

    return Qwen3Config(
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=32,
        vocab_size=1024,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        tie_word_embeddings=True,
        eos_token_id=0,
        stop_token_ids=(0,),
        max_position_embeddings=4096,
    )


def dsv4_smoke_config():
    from pegainfer_tpu.models import dsv4

    return dsv4.DSv4Config(
        vocab_size=128, dim=32, moe_inter_dim=16, n_layers=3,
        num_attention_heads=4, head_dim=16, q_lora_rank=16,
        qk_rope_head_dim=8, o_groups=2, o_lora_rank=8,
        sliding_window=8, n_routed_experts=8, n_shared_experts=1,
        n_activated_experts=2, n_hash_layers=1,
        routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=2, index_head_dim=8,
        index_topk=4, max_position_embeddings=4096,
        rope_theta=10000.0, compress_rope_theta=10000.0,
        compress_ratios=(0, 8, 4), yarn_original_seq_len=256,
        yarn_factor=4.0,
    )


def dsv4_scaled_config():
    """Scaled DSv4 (full 671B needs an MP8 pod slice, not one chip):
    functional on-TPU evidence for the sparse-attention / hyper-connection
    / MoE decode path, NOT a parity-size perf number."""
    from pegainfer_tpu.models import dsv4

    return dsv4.DSv4Config(
        vocab_size=32768, dim=2048, moe_inter_dim=1024, n_layers=12,
        num_attention_heads=16, head_dim=128, q_lora_rank=512,
        qk_rope_head_dim=64, o_groups=4, o_lora_rank=256,
        sliding_window=512, n_routed_experts=32, n_shared_experts=1,
        n_activated_experts=6, n_hash_layers=4,
        routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=4, index_head_dim=128,
        index_topk=64, max_position_embeddings=8192,
        rope_theta=10000.0, compress_rope_theta=10000.0,
        compress_ratios=(0, 8, 4) * 4, yarn_original_seq_len=4096,
        yarn_factor=2.0,
    )


def main():
    smoke = os.environ.get("PEGAINFER_BENCH_SMOKE") == "1"
    prompt_len = 128 if smoke else 1024
    n_decode = 16 if smoke else 256

    if smoke:  # smoke mode validates the harness on CPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS", "") == "axon":
        # fail FAST when the host-side axon relay is down — jax.devices()
        # would otherwise hang forever (utils/tpu_health, scripts/tpu_probe)
        from pegainfer_tpu.utils.tpu_health import relay_up

        if not relay_up():
            note("TPU relay DOWN (no tunnel ports open) — cannot bench")
            sys.exit(3)
        # ports open but claim leg wedged: bound backend init too
        import signal

        def _init_timeout(signum, frame):
            note("TPU backend init wedged (>180s) — cannot bench")
            sys.exit(3)

        signal.signal(signal.SIGALRM, _init_timeout)
        signal.alarm(180)
        import jax

        jax.devices()
        signal.alarm(0)

    import jax

    from pegainfer_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    note(f"backend={jax.default_backend()} devices={jax.devices()}")
    model = os.environ.get("PEGAINFER_BENCH_MODEL", "qwen3")
    quant = os.environ.get("PEGAINFER_BENCH_QUANT")

    result = run_family(model, quant, smoke, prompt_len, n_decode)
    if result is None:
        sys.exit(1)

    # second driver-captured family (VERDICT r3 #10): the default run also
    # measures Qwen3.5 bf16 on the flat union layout, embedded in the same
    # JSON line so the driver's BENCH_r{N}.json independently confirms a
    # second family each round. PEGAINFER_BENCH_SECOND=0 disables.
    if (model == "qwen3" and not quant and not smoke
            and os.environ.get("PEGAINFER_BENCH_SECOND") != "0"
            # guard the driver's time budget: the headline must always
            # land; skip the second family if the first took too long
            # (cold caches / slow tunnel)
            and time.time() - _T0 < 1200):
        import gc

        # drop the first family's device buffers: the executor's jit
        # caches pin compiled executables (and through them the donated
        # params/KV buffers) — without clear_caches the second family
        # OOMs HBM (measured RESOURCE_EXHAUSTED)
        jax.clear_caches()
        gc.collect()
        try:
            second = run_family("qwen35", None, smoke, prompt_len, 128)
        except Exception as e:  # second family must never kill the headline
            note(f"second-family bench failed: {e!r}")
            second = None
        if second is not None:
            result["extra"]["second"] = {
                "metric": second["metric"], "value": second["value"],
                "unit": second["unit"], "vs_baseline": second["vs_baseline"],
                "ttft_ms": second["extra"]["ttft_ms"],
            }
    print(json.dumps(result))


def run_family(model, quant, smoke, prompt_len, n_decode):
    """Build one family's engine, run warmup + one measured request, and
    return the bench result dict (None on failure)."""
    import numpy as np

    from pegainfer_tpu.engine.contract import (
        EngineLoadOptions,
        Finished,
        GenerateRequest,
        SamplingParams,
        Token,
    )
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler
    from pegainfer_tpu.models import qwen3 as q3

    import jax
    # 64-token pages minimize decode DMA-issue count (docs/PERF.md)
    num_pages = 64 if smoke else 192
    page_size = 16 if smoke else 64
    if model == "qwen35":
        from pegainfer_tpu.models import qwen35 as q35

        if smoke:
            cfg = q35.Qwen35Config(
                hidden_size=128, intermediate_size=256, num_hidden_layers=4,
                num_attention_heads=4, num_key_value_heads=2, head_dim=32,
                vocab_size=1024, rms_norm_eps=1e-6, rope_theta=1e6,
                partial_rotary_factor=0.25,
                layer_types=("linear_attention",) * 3 + ("full_attention",),
                linear_num_key_heads=2, linear_num_value_heads=4,
                linear_key_head_dim=16, linear_value_head_dim=16,
                linear_conv_kernel_dim=4, tie_word_embeddings=True,
                eos_token_id=0, stop_token_ids=(0,),
                max_position_embeddings=4096,
            )
        else:
            cfg = q35.bench_config()
        params = q35.init_bench_params(cfg)
        if quant == "int8":
            params = q35.quantize_params_int8(params)
        runtime = q35.make_runtime(
            cfg, params, num_pages=num_pages, page_size=page_size,
            max_slots=int(os.environ.get("PEGAINFER_BENCH_MAX_BATCH", "64")),
            flat_decode=os.environ.get("PEGAINFER_Q35_FLAT", "1") == "1")
        metric_base = "qwen35_4b"
        baseline = BASELINE_TPOT_MS_QWEN35
    elif model == "dsv4":
        from pegainfer_tpu.models import dsv4
        from pegainfer_tpu.models.dsv4_engine import make_runtime as mk_dsv4

        cfg = dsv4_smoke_config() if smoke else dsv4_scaled_config()
        params = dsv4.init_random_params(cfg, seed=0)
        metric_base = "dsv4_scaled"
        modes = dsv4.RunModes()
        if quant in ("resident", "int8-experts"):
            # quantized-resident serving (fp8 containers + packed fp4
            # experts) with the fused Pallas dequant-GEMV on the decode
            # routed experts — the production DSv4 mode.
            # "int8-experts": the speed mode — routed expert stacks int8
            # per-output-channel (2x fp4 bytes, streamed faster; see
            # docs/PERF.md round 4 cont.)
            params = dsv4.quantize_params_resident(
                params, experts="int8" if quant == "int8-experts" else "fp4")
            on_tpu = jax.default_backend() == "tpu"
            modes = dsv4.RunModes(fp4_kernel=on_tpu, fp8_kernel=on_tpu)
            metric_base = ("dsv4_scaled_resident" if quant == "resident"
                           else "dsv4_scaled_int8e")
        runtime = mk_dsv4(cfg, params, max_model_len=2048, max_slots=2,
                          modes=modes)
        baseline = BASELINE_TPOT_MS  # no like-for-like reference at this scale
    else:
        cfg = smoke_config() if smoke else qwen3_4b_config()
        params = q3.init_bench_params(cfg)
        if quant == "int8":
            params = q3.quantize_params_int8(params)
        runtime = q3.make_runtime(cfg, params, num_pages=num_pages,
                                  page_size=page_size)
        metric_base = "qwen3_4b"
        baseline = BASELINE_TPOT_MS
    okw = {}
    if os.environ.get("PEGAINFER_BENCH_DECODE_BLOCK"):
        okw["decode_block"] = int(os.environ["PEGAINFER_BENCH_DECODE_BLOCK"])
    if os.environ.get("PEGAINFER_BENCH_MAX_BATCH"):
        okw["max_batch_size"] = int(os.environ["PEGAINFER_BENCH_MAX_BATCH"])
    if os.environ.get("PEGAINFER_BENCH_DECODE_BLOCK_MAX"):
        okw["decode_block_max"] = int(os.environ["PEGAINFER_BENCH_DECODE_BLOCK_MAX"])
    if os.environ.get("PEGAINFER_BENCH_PIPELINE_DEPTH"):
        okw["decode_pipeline_depth"] = int(
            os.environ["PEGAINFER_BENCH_PIPELINE_DEPTH"])
    ex = JaxExecutor(runtime, EngineLoadOptions(**okw))
    handle = start_scheduler(ex)
    note("params + runtime built; scheduler up")

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, prompt_len).tolist()
    # distinct warmup prompt: the prefix cache would otherwise turn the
    # measured request into a warm hit (and pay tail-chunk compiles in TTFT)
    warm_prompt = rng.integers(0, cfg.vocab_size, prompt_len).tolist()
    greedy = SamplingParams(ignore_eos=True)

    def run_request(max_tokens, use_warm_prompt=False):
        """One request through the real engine path (scheduler + async
        pipelined decode). Returns (ttft_ms, inter-token deltas ms)."""
        req = GenerateRequest(
            prompt_tokens=warm_prompt if use_warm_prompt else prompt,
            max_tokens=max_tokens, params=greedy,
            queued_at_unix_s=time.time())
        t0 = time.perf_counter()
        handle.submit(req)
        ttft = None
        stamps = []
        for ev in req.channel:
            now = time.perf_counter()
            if isinstance(ev, Token):
                if ttft is None:
                    ttft = (now - t0) * 1e3
                stamps.append(now)
            elif isinstance(ev, Finished):
                break
        return ttft, stamps

    run_request(8, use_warm_prompt=True)  # warmup: compiles the bucket ladder
    note(f"{model} warmup request done (compiles)")

    ttft_ms, stamps = run_request(n_decode + 2)
    note(f"{model} measured request done")
    handle.shutdown()
    del handle, ex, runtime, params  # free this family's device buffers
    if len(stamps) < 4:
        print(json.dumps({"metric": "bench_error", "value": -1.0,
                          "unit": "ms", "vs_baseline": 0.0,
                          "extra": {"tokens_seen": len(stamps)}}))
        return None

    # Tokens arrive in decode_block bursts: steady TPOT = wall time per
    # token over the post-first-block region; percentiles from block-level
    # deltas normalized by burst size.
    k = 2
    tpot_p50 = (stamps[-1] - stamps[k]) * 1e3 / (len(stamps) - 1 - k)
    deltas = [(b - a) * 1e3 for a, b in zip(stamps[k:], stamps[k + 1:])]
    block_deltas = sorted(d for d in deltas if d > 0.5)
    if block_deltas:
        blocks = max(1, round(len(deltas) / len(block_deltas)))
        times = [d / blocks for d in block_deltas]
    else:
        times = [tpot_p50]
    metric = (f"{metric_base}_decode_tpot_p50_ms"
              if not quant or quant in ("resident", "int8-experts")
              else f"{metric_base}_{quant}_decode_tpot_p50_ms")
    result = {
        "metric": metric,
        "value": round(tpot_p50, 3),
        "unit": "ms",
        "vs_baseline": round(baseline / tpot_p50, 3),
        "extra": {
            "ttft_ms": round(ttft_ms, 1),
            "decode_tok_s": round(1e3 / tpot_p50, 1),
            "tpot_p95_ms": round(sorted(times)[int(len(times) * 0.95)], 3),
            # token DELIVERY cadence (VERDICT r4 #2): the longest stall an
            # SSE consumer sees — tokens arrive in decode-block bursts, so
            # worst/p95 inter-token gap ≈ one steady block's wall time
            "delivery_gap_worst_ms": round(max(deltas), 1) if deltas else 0.0,
            "delivery_gap_p95_ms": round(
                sorted(deltas)[int(len(deltas) * 0.95)], 1) if deltas else 0.0,
            "prompt_len": prompt_len,
            "n_decode": n_decode,
            "smoke": smoke,
        },
    }
    return result


if __name__ == "__main__":
    main()
