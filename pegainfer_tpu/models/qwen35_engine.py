"""Qwen3.5 engine startup (reference: pegainfer-qwen35-4b/src/lib.rs:65-98)."""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import jax

from pegainfer_tpu.engine.contract import EngineHandle, EngineLoadOptions
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen35 as q35
from pegainfer_tpu.utils.weights import load_state_dict

log = logging.getLogger("pegainfer.qwen35")

# Larger pages cut the decode kernel's per-page DMA-issue count (the
# long-context bottleneck): 16k-ctx step = 35.9 / 26.2 / 21.3 ms at page
# size 16 / 32 / 64 (scripts/decode_context_sweep.py). Waste is ~half a
# page (~32 tokens) per request; prefix-cache sharing granularity coarsens
# to page multiples — both negligible at serving scale.
DEFAULT_PAGE_SIZE = 64
FALLBACK_NUM_PAGES = 512


def probe_model(model_path: str) -> bool:
    try:
        with open(os.path.join(model_path, "config.json")) as f:
            archs = json.load(f).get("architectures", [])
    except OSError:
        return False
    return any(a in ("Qwen3NextForCausalLM", "Qwen3_5ForCausalLM") for a in archs)


def start_engine(
    model_path: str,
    options: Optional[EngineLoadOptions] = None,
    tp_size: int = 1,
) -> EngineHandle:
    tp_size = tp_size or 1  # 0 = CLI auto default -> single device
    opts = options or EngineLoadOptions()
    cfg = q35.Qwen35Config.from_model_path(model_path)
    log.info(
        "loading %s (%d layers: %d linear + %d full per period-%d group)",
        model_path, cfg.num_hidden_layers, cfg.period - 1, 1, cfg.period,
    )
    sd = load_state_dict(model_path)
    params = q35.params_from_state_dict(cfg, sd)
    del sd
    if opts.quantize == "int8":
        log.info("quantizing weights: int8 per-output-channel (weight-only)")
        params = q35.quantize_params_int8(params)

    page_size = DEFAULT_PAGE_SIZE
    num_pages = opts.max_num_pages or _compute_num_pages(cfg, page_size, opts, params)
    log.info("KV pool: %d pages x %d tokens", num_pages, page_size)

    # flat UNION decode layout: 2.4x faster weight streaming on one device.
    # Under TP the default stays grouped (no multi-chip measurement exists
    # in this env); PEGAINFER_Q35_FLAT_TP=1 opts into flat-under-TP — GSPMD
    # shards the packed width slots, parity pinned by
    # tests/test_qwen35_tp_flat.py (program collective counts recorded in
    # docs/PERF.md round 4).
    flat_tp = os.environ.get("PEGAINFER_Q35_FLAT_TP") == "1"
    runtime = q35.make_runtime(
        cfg, params, num_pages, page_size, max_slots=opts.max_batch_size,
        flat_decode=(tp_size == 1 or flat_tp),
    )
    if tp_size > 1:
        from pegainfer_tpu.parallel.sharding import (
            MeshConfig, make_mesh, shard_qwen35, shard_qwen35_union,
        )

        mesh = make_mesh(MeshConfig(dp=1, tp=tp_size))
        if flat_tp:
            runtime.params, runtime.state = shard_qwen35_union(
                mesh, cfg, runtime.params, runtime.state)
        else:
            runtime.params, runtime.state = shard_qwen35(
                mesh, cfg, runtime.params, runtime.state)
    executor = JaxExecutor(runtime, opts)
    if opts.precompile and opts.enable_cuda_graph:
        log.info("precompiling decode buckets")
        executor.precompile()
    return start_scheduler(executor, seed=opts.seed)


def _compute_num_pages(cfg, page_size, opts, params) -> int:
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    limit = stats.get("bytes_limit")
    if not limit:
        return FALLBACK_NUM_PAGES
    params_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    # slot state (rec + conv) is allocated up front; subtract it too
    slot_bytes = (
        cfg.num_groups * (cfg.period - 1) * (opts.max_batch_size + 1)
        * (cfg.linear_num_value_heads * cfg.linear_key_head_dim
           * cfg.linear_value_head_dim + cfg.linear_conv_kernel_dim * cfg.conv_dim)
        * 4
    )
    # hybrid prefix-cache snapshots are HBM too: the cache's cap x one
    # slot's rec+conv bytes (shared constant — engine/kv.py)
    from pegainfer_tpu.engine.kv import DEFAULT_MAX_SNAPSHOTS

    snap_bytes = DEFAULT_MAX_SNAPSHOTS * (
        cfg.num_groups * (cfg.period - 1)
        * (cfg.linear_num_value_heads * cfg.linear_key_head_dim
           * cfg.linear_value_head_dim
           + cfg.linear_conv_kernel_dim * cfg.conv_dim) * 4
    )
    free = (limit - max(stats.get("bytes_in_use", 0), params_bytes)
            - slot_bytes - snap_bytes)
    per_page = q35.kv_bytes_per_page(cfg, page_size)
    n = int(free * opts.kv_memory_fraction) // per_page
    return max(min(n, 1 << 16), 2)
