"""Two-process multi-host engine run (CPU, jax.distributed) + token parity.

Exercises the REAL multi-process wiring that a TPU pod run uses —
``multihost.initialize`` (coordination service), ``global_mesh`` over both
processes' devices, GSPMD param placement spanning processes, and the full
engine (scheduler → JaxExecutor → jitted sharded programs) — with the
REPLICATED-DRIVER serving design: every process runs the identical engine;
request intake happens on the coordinator and is broadcast to followers
(multihost.broadcast_request), so all processes dispatch the same program
sequence in lockstep and collectives match up. That is the TPU answer to
the reference's rank-worker bootstrap (deepseek-v4/src/direct/
worker.rs:38-110): the "worker loop" is the same engine binary, not a
bespoke command channel.

Run (no args — spawns itself twice):  python scripts/multihost_two_proc.py
Child mode:                           ... --proc <i> --port <p>

Writes per-process token outputs, asserts 2-proc == 1-proc greedy tokens.
Real pod measurement remains hardware-blocked (BASELINE.json scaling north
star); this validates the coordinator/serving split end-to-end.
"""
import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
N_PROCS = 2
LOCAL_DEVS = 4  # per process -> 8 global


def child(proc_id: int, port: int, out_dir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVS}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO))

    from pegainfer_tpu.parallel import multihost

    assert multihost.initialize(f"localhost:{port}", N_PROCS, proc_id)
    assert jax.process_count() == N_PROCS
    assert jax.device_count() == N_PROCS * LOCAL_DEVS
    mesh = multihost.global_mesh(dp=1, tp=N_PROCS * LOCAL_DEVS)

    toks = run_engine(mesh, multihost)
    with open(os.path.join(out_dir, f"proc{proc_id}.json"), "w") as f:
        json.dump(toks, f)
    print(f"proc {proc_id} ({multihost.is_coordinator() and 'coordinator' or 'follower'}): {toks}",
          flush=True)


def run_engine(mesh, multihost=None):
    """Full engine generate on ``mesh``; with ``multihost``, the prompt is
    taken on the coordinator and broadcast (followers pass None)."""
    import numpy as np

    from pegainfer_tpu.engine.contract import (
        EngineLoadOptions, GenerateRequest, SamplingParams, Token,
    )
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler
    from pegainfer_tpu.models import qwen3 as q3
    from pegainfer_tpu.parallel.sharding import shard_qwen3

    cfg = q3.Qwen3Config(
        hidden_size=256, intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=16, num_key_value_heads=8, head_dim=16,
        vocab_size=1024, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=False, eos_token_id=0, stop_token_ids=(0,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=0)  # same host bytes everywhere
    num_pages, page_size = 24, 16
    kv = q3.make_kv_pages(cfg, num_pages, page_size)
    params, kv = shard_qwen3(mesh, cfg, params, kv)
    runtime = q3.make_runtime(cfg, params, num_pages, page_size)
    runtime.state = kv

    executor = JaxExecutor(runtime, EngineLoadOptions(
        precompile=False, max_batch_size=2, max_model_len=128))
    handle = start_scheduler(executor, seed=0)
    try:
        # intake on the coordinator, broadcast to followers — then every
        # process submits the SAME request to its local (replicated) engine
        prompt = [3, 17, 42, 9, 88, 5, 6, 7]
        if multihost is not None:
            src = prompt if multihost.is_coordinator() else None
            prompt = multihost.broadcast_request(src)
        req = GenerateRequest(prompt_tokens=list(prompt), max_tokens=6,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        return [ev.id for ev in req.channel if isinstance(ev, Token)]
    finally:
        handle.shutdown()


def parent() -> None:
    import socket

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out_dir = tempfile.mkdtemp(prefix="pegainfer_mh_")

    # single-process oracle (same 8 virtual devices, one process)
    oracle = subprocess.run(
        [sys.executable, __file__, "--oracle", "--out", out_dir],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    print(oracle.stdout, end="")
    assert oracle.returncode == 0, oracle.stderr[-2000:]

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--proc", str(i), "--port", str(port),
             "--out", out_dir],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(N_PROCS)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        print(o, end="")
        assert p.returncode == 0, f"proc {i} failed:\n{o[-2000:]}"

    tok = {}
    for name in ("oracle", "proc0", "proc1"):
        with open(os.path.join(out_dir, f"{name}.json")) as f:
            tok[name] = json.load(f)
    assert tok["proc0"] == tok["proc1"], (tok["proc0"], tok["proc1"])
    assert tok["proc0"] == tok["oracle"], (tok["proc0"], tok["oracle"])
    print(f"TWO-PROCESS PARITY OK: {tok['proc0']} == single-process oracle")


def oracle(out_dir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_PROCS * LOCAL_DEVS}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO))
    from pegainfer_tpu.parallel.multihost import global_mesh

    toks = run_engine(global_mesh(dp=1, tp=N_PROCS * LOCAL_DEVS))
    with open(os.path.join(out_dir, "oracle.json"), "w") as f:
        json.dump(toks, f)
    print(f"single-process oracle: {toks}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.oracle:
        oracle(a.out)
    elif a.proc is not None:
        child(a.proc, a.port, a.out)
    else:
        parent()
