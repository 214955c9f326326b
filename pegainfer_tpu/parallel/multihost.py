"""Multi-host bring-up: jax.distributed init + global mesh construction.

The compute path is already multi-host-ready: every program in this repo
is a GSPMD program over global arrays with PartitionSpecs (parallel/
sharding.py), so the SAME jitted step runs unchanged whether the mesh's
devices live on one host or many — XLA inserts ICI collectives within a
host/pod slice and DCN collectives across hosts. What multi-host adds is
purely bring-up: every host runs THIS SAME process image, joins the
coordinator, and contributes its local chips to the global device list.

Reference analog: the reference's multi-process story is NCCL rank workers
bootstrapped over MPI-ish env (deepseek-v4/src/direct/worker.rs:38-110,
pegainfer-comm RDMA bootstrap). On TPU the runtime (libtpu + JAX
coordination service) replaces all of that — one initialize() call.

Launch pattern (one process per host):

    PEGAINFER_COORD=host0:8476 PEGAINFER_NUM_PROCS=4 PEGAINFER_PROC_ID=$i \
        python -m pegainfer_tpu.server.main --model-path … --tp-size 8

On Cloud TPU pods the three env vars are unnecessary — jax.distributed
auto-detects from the TPU metadata — so ``initialize()`` is a no-op wrapper
there. Single-process runs skip initialization entirely.

Tested degenerately (single process, virtual devices) in
tests/test_multihost.py; real multi-host hardware is not available in this
environment (BASELINE.json north star: ≥80% scaling efficiency at 1 chip /
1 host / N hosts — the measurement is staged until a pod slice exists).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger("pegainfer.multihost")

_INITIALIZED = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the multi-process JAX runtime if configured; no-op otherwise.

    Reads PEGAINFER_COORD / PEGAINFER_NUM_PROCS / PEGAINFER_PROC_ID when
    args are None. Returns True when running multi-process. Safe to call
    more than once.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("PEGAINFER_COORD")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["PEGAINFER_NUM_PROCS"])
        if "PEGAINFER_NUM_PROCS" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["PEGAINFER_PROC_ID"])
        if "PEGAINFER_PROC_ID" in os.environ else None)
    if coordinator is None and num_processes is None:
        return False  # single-process (or TPU-pod auto-detect at first use)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    log.info("multi-host runtime: process %d/%d, %d local + %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def global_mesh(dp: int = 1, tp: Optional[int] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over ALL processes' devices, tp innermost (fastest links).

    Device order follows jax.devices() — process-major, so a tp axis that
    fits within one host's chips stays on ICI and dp spans DCN (the layout
    the scaling-efficiency target assumes). tp=None → all devices / dp.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if tp is None:
        if len(devs) % dp:
            raise ValueError(f"{len(devs)} devices not divisible by dp={dp}")
        tp = len(devs) // dp
    if dp * tp > len(devs):
        raise ValueError(f"need {dp * tp} devices, have {len(devs)}")
    arr = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def is_coordinator() -> bool:
    """True on the process that should own serving-side singletons (the
    HTTP frontend, metrics, request intake). Analog of the reference's
    rank-0 host greedy loop (direct/scheduler.rs)."""
    return jax.process_index() == 0


def broadcast_request(tokens: Optional[Sequence[int]],
                      max_len: int = 8192) -> list:
    """Ship a request's token ids from the coordinator to every process.

    The multi-host serving design is REPLICATED-DRIVER: every process runs
    the identical engine (scheduler + executor) so all hosts dispatch the
    same jitted programs in lockstep and XLA's cross-host collectives
    line up. The only host-side divergence is request intake (HTTP lives
    on the coordinator) — this closes it: the coordinator passes the
    prompt, followers pass None, everyone returns the same list. Rides a
    device broadcast (multihost_utils), so it also acts as the
    submit-order barrier that keeps schedulers step-aligned.
    """
    from jax.experimental import multihost_utils

    buf = np.full(max_len + 1, -1, np.int32)
    if tokens is not None:
        if len(tokens) > max_len:
            raise ValueError(f"request longer than broadcast cap {max_len}")
        buf[0] = len(tokens)
        buf[1:1 + len(tokens)] = np.asarray(tokens, np.int32)
    out = multihost_utils.broadcast_one_to_all(buf)
    n = int(out[0])
    if n < 0:
        raise RuntimeError("broadcast_request: coordinator sent no request")
    return [int(t) for t in out[1:1 + n]]
