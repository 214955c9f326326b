"""Qwen3 engine startup: checkpoint → sharded runtime → scheduler.

Reference parity: pegainfer-qwen3-4b/src/lib.rs:55-66 ``probe_model`` /
``start_engine`` and the KV-pool-from-free-VRAM sizing pattern
(src/weights.rs:316-334).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

from pegainfer_tpu.engine.contract import EngineHandle, EngineLoadOptions
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen3 as q3
from pegainfer_tpu.utils.weights import load_state_dict

log = logging.getLogger("pegainfer.qwen3")

# Larger pages cut the decode kernel's per-page DMA-issue count (the
# long-context bottleneck): 16k-ctx step = 35.9 / 26.2 / 21.3 ms at page
# size 16 / 32 / 64 (scripts/decode_context_sweep.py). Waste is ~half a
# page (~32 tokens) per request; prefix-cache sharing granularity coarsens
# to page multiples — both negligible at serving scale.
DEFAULT_PAGE_SIZE = 64
FALLBACK_NUM_PAGES = 512


def probe_model(model_path: str) -> bool:
    import json
    import os

    try:
        with open(os.path.join(model_path, "config.json")) as f:
            archs = json.load(f).get("architectures", [])
    except OSError:
        return False
    return any(a == "Qwen3ForCausalLM" for a in archs)


def compute_num_pages(
    cfg: q3.Qwen3Config,
    page_size: int,
    fraction: float,
    params_bytes: int,
) -> int:
    """Size the KV pool to ``fraction`` of post-weights free HBM
    (reference: 85% of free VRAM, weights.rs:316-334)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    limit = stats.get("bytes_limit")
    in_use = stats.get("bytes_in_use", 0)
    if not limit:
        return FALLBACK_NUM_PAGES
    free = limit - max(in_use, params_bytes)
    per_page = q3.kv_bytes_per_page(cfg, page_size)
    n = int(free * fraction) // per_page
    return max(min(n, 1 << 16), 2)


def start_engine(
    model_path: str,
    options: Optional[EngineLoadOptions] = None,
    tp_size: int = 1,
) -> EngineHandle:
    tp_size = tp_size or 1  # 0 = CLI auto default -> single device
    opts = options or EngineLoadOptions()
    cfg = q3.Qwen3Config.from_model_path(model_path)
    log.info("loading %s (%d layers, hidden %d)", model_path, cfg.num_hidden_layers, cfg.hidden_size)
    sd = load_state_dict(model_path)
    params = q3.params_from_state_dict(cfg, sd)
    del sd
    if opts.quantize == "int8":
        log.info("quantizing weights to int8 (weight-only, per channel)")
        params = q3.quantize_params_int8(params)
    params_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))

    page_size = DEFAULT_PAGE_SIZE
    num_pages = opts.max_num_pages or compute_num_pages(
        cfg, page_size, opts.kv_memory_fraction, params_bytes
    )
    log.info("KV pool: %d pages x %d tokens", num_pages, page_size)

    if tp_size > 1:
        from pegainfer_tpu.parallel.sharding import MeshConfig, make_mesh, shard_qwen3

        mesh = make_mesh(MeshConfig(dp=1, tp=tp_size))
        kv = q3.make_kv_pages(cfg, num_pages, page_size)
        params, kv = shard_qwen3(mesh, cfg, params, kv)
        runtime = q3.make_runtime(cfg, params, num_pages, page_size)
        runtime.state = kv
    else:
        runtime = q3.make_runtime(cfg, params, num_pages, page_size)

    executor = JaxExecutor(runtime, opts)
    if opts.precompile and opts.enable_cuda_graph:
        log.info("precompiling decode buckets")
        executor.precompile()
    return start_scheduler(executor, seed=opts.seed)
