"""CLI product entrypoint: model detection → engine → HTTP server.

Reference parity: pegainfer-server/src/main.rs:13-156 (clap CLI, model-type
detection from config.json via src/server_engine.rs:33-76, engine startup,
frontend serve). Run as ``python -m pegainfer_tpu.server.main --model-path …``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def detect_model_type(model_path: str) -> str:
    """From config.json architectures (reference server_engine.rs:33-76)."""
    with open(os.path.join(model_path, "config.json")) as f:
        cfg = json.load(f)
    if cfg.get("model_type") == "deepseek_v4":
        return "deepseek_v4"
    if cfg.get("model_type") == "deepseek_v2":
        # the Lite EP reference engine (reference lib.rs probe_config_json)
        return "dsv2lite"
    archs = cfg.get("architectures") or []
    if "Qwen3ForCausalLM" in archs:
        return "qwen3"
    if any(a in ("Qwen3NextForCausalLM", "Qwen3_5ForCausalLM") for a in archs):
        return "qwen35"
    if any("Deepseek" in a for a in archs):
        return "deepseek_v4"
    raise ValueError(f"unsupported architectures: {archs}")


def build_engine_and_tokenizer(args):
    from pegainfer_tpu.engine.contract import EngineLoadOptions

    okw = {}
    if getattr(args, "delivery_profile", False):
        # delivery-bounded serving: small steady blocks + a deeper
        # speculative window (measured qwen3 bf16 1024/256: worst
        # inter-token gap 218.6 → 49.7 ms at +4.2% TPOT, docs/PERF.md
        # round 5). Explicit --decode-block-max / --pipeline-depth win.
        okw = {"decode_block_max": 4, "decode_pipeline_depth": 4}
    if getattr(args, "decode_block_max", 0):
        okw["decode_block_max"] = args.decode_block_max
    if getattr(args, "pipeline_depth", 0):
        okw["decode_pipeline_depth"] = args.pipeline_depth
    opts = EngineLoadOptions(
        precompile=not args.no_precompile,
        seed=args.seed,
        max_num_pages=args.max_num_pages,
        max_batch_size=args.max_batch_size,
        quantize=args.quantize,
        enable_prefix_cache=not args.no_prefix_cache,
        prefill_chunk=args.prefill_chunk,
        prefill_chunk_mixed=args.prefill_chunk_mixed,
        **okw,
    )
    if args.sim:
        from pegainfer_tpu.server.tokenizer import SimTokenizer
        from pegainfer_tpu.sim import SimulatedEngineConfig, start_engine

        sim_cfg = SimulatedEngineConfig(ttft_s=args.sim_ttft, tpot_s=args.sim_tpot)
        return start_engine(sim_cfg, opts), SimTokenizer(), "pegainfer-sim"

    from pegainfer_tpu.server.tokenizer import HFTokenizer

    mtype = detect_model_type(args.model_path)
    if mtype == "qwen3":
        from pegainfer_tpu.models import qwen3_engine

        handle = qwen3_engine.start_engine(args.model_path, opts, tp_size=args.tp_size)
    elif mtype == "qwen35":
        from pegainfer_tpu.models import qwen35_engine

        handle = qwen35_engine.start_engine(args.model_path, opts, tp_size=args.tp_size)
    elif mtype == "deepseek_v4":
        from pegainfer_tpu.models import dsv4_engine

        handle = dsv4_engine.start_engine(args.model_path, opts, tp_size=args.tp_size)
    elif mtype == "dsv2lite":
        from pegainfer_tpu.models import dsv2lite

        handle = dsv2lite.start_engine(
            args.model_path, opts,
            ep_size=args.tp_size if args.tp_size > 0 else None)
    else:
        raise NotImplementedError(f"model type {mtype} engine not wired yet")
    name = os.path.basename(os.path.normpath(args.model_path))
    return handle, HFTokenizer(args.model_path), name


def main(argv=None):
    p = argparse.ArgumentParser("pegainfer-tpu serve")
    p.add_argument("--model-path", help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--tp-size", type=int, default=0,
                   help="TP world (0 = auto: DSv4 picks the largest divisor "
                        "of 8 the devices allow; Qwen families use 1)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-num-pages", type=int, default=None)
    p.add_argument("--max-batch-size", type=int, default=64)
    p.add_argument("--quantize", choices=["int8", "bf16"], default=None,
                   help="int8: weight-only int8 serving (Qwen families, "
                        "approximate, ~2x decode speed); bf16: dequantize a "
                        "quantized checkpoint at load (DSv4 numerics oracle; "
                        "DSv4 default serves the checkpoint's FP8/FP4 "
                        "resident in HBM)")
    p.add_argument("--no-prefix-cache", action="store_true",
                   help="disable shared-prompt-prefix page caching")
    p.add_argument("--prefill-chunk", type=int, default=2048,
                   help="chunk size for long-prompt prefill (tokens)")
    p.add_argument("--prefill-chunk-mixed", type=int, default=256,
                   help="chunk size while other requests are decoding "
                        "(adaptive chunking — bounds decode stalls; set "
                        "equal to --prefill-chunk to disable)")
    p.add_argument("--delivery-profile", action="store_true",
                   help="delivery-bounded decode: 4-token steady blocks + "
                        "4-deep speculative pipeline (worst SSE gap ~50 ms "
                        "at +4%% TPOT; default is throughput-optimal "
                        "16-token blocks — docs/PERF.md round 5)")
    p.add_argument("--decode-block-max", type=int, default=0,
                   help="steady-state decode block size override")
    p.add_argument("--pipeline-depth", type=int, default=0,
                   help="speculative decode blocks in flight (default 2)")
    p.add_argument("--no-precompile", action="store_true",
                   help="skip decode-bucket precompilation (reference: --cuda-graph off)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the serving process "
                        "(reference: --deepseek-prefill-profile / nsys playbook)")
    p.add_argument("--sim", action="store_true", help="simulated engine (no TPU)")
    p.add_argument("--sim-ttft", type=float, default=0.02)
    p.add_argument("--sim-tpot", type=float, default=0.005)
    args = p.parse_args(argv)

    logging.basicConfig(
        level=os.environ.get("PEGAINFER_LOG", "INFO"),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    if not args.sim and not args.model_path:
        p.error("--model-path required (or use --sim)")

    from pegainfer_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    if not args.sim:
        # multi-host: join the coordinator when PEGAINFER_COORD/_NUM_PROCS/
        # _PROC_ID are set (parallel/multihost.py); no-op single-process
        from pegainfer_tpu.parallel import multihost

        multihost.initialize()
    engine, tokenizer, model_name = build_engine_and_tokenizer(args)

    from aiohttp import web

    from pegainfer_tpu.server.api import OpenAIApp

    app = OpenAIApp(engine, tokenizer, model_name).build()
    logging.getLogger("pegainfer.server").info(
        "serving %s on http://%s:%d", model_name, args.host, args.port
    )
    if args.profile_dir:
        from pegainfer_tpu.utils.tracing import profile_trace

        with profile_trace(args.profile_dir):
            web.run_app(app, host=args.host, port=args.port, print=None)
    else:
        web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    sys.exit(main())
