"""Tracing / profiling hooks.

Reference analogs: fastrace spans + Chrome-trace FileReporter
(pegainfer-server/src/trace_reporter.rs:15-117), the CUPTI range profiler
(pegainfer-cupti), and the nsys playbook. On TPU:

- ``profile_trace(dir)``: jax.profiler trace → TensorBoard/Perfetto (XLA op
  timeline, HLO cost view) — the nsys/CUPTI replacement.
- ``span(name)``: host-side span that both logs (duration) and annotates the
  device timeline via jax.profiler.TraceAnnotation.
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("pegainfer.trace")


@contextlib.contextmanager
def profile_trace(trace_dir: str):
    """Capture a device+host profile into ``trace_dir`` (open with
    TensorBoard's profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profile written to %s", trace_dir)


@contextlib.contextmanager
def span(name: str, log_threshold_ms: float = 0.0):
    """Host span + device timeline annotation."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = (time.perf_counter() - t0) * 1e3
    if dt >= log_threshold_ms:
        log.debug("%s: %.2f ms", name, dt)
