"""Persistent XLA compilation cache setup.

Compiles over the serving link are slow (tens of seconds each); the
persistent cache makes warmup a one-time cost per (program, shape). The
reference's analog is CUDA-Graph capture reuse within a process — this
extends it across processes.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("pegainfer.cache")

DEFAULT_DIR = os.environ.get("PEGAINFER_JAX_CACHE", "/tmp/pegainfer_jax_cache")


def enable(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        log.warning("compilation cache unavailable: %s", e)
