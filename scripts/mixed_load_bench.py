"""Mixed-load decode TPOT: what a long prefill does to active streams.

The reference bounds prefill-induced decode stalls by fusing GEMMs over
[prefill ‖ decode] in one pass (unified_forward.rs:1-78) — decode then
advances ONE token per unified pass. This engine instead time-slices:
chunked prefill yields between chunks and the active set gets a fused
N-token decode block each slice. This script measures what that policy
actually delivers: steady TPOT of an active stream, then its TPOT while
10k-token prompts continuously arrive.

Run: python scripts/mixed_load_bench.py [qwen3]
"""
import faulthandler
import pathlib
import sys
import threading
import time

faulthandler.dump_traceback_later(1800, exit=True)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import qwen3 as q3
import bench

print("backend:", jax.default_backend(), flush=True)
model = sys.argv[1] if len(sys.argv) > 1 else "qwen3"
if model == "qwen35":
    from pegainfer_tpu.models import qwen35 as q35

    cfg = q35.bench_config()
    params = q35.init_bench_params(cfg)
    rt = q35.make_runtime(cfg, params, num_pages=384, page_size=64,
                          max_slots=64, flat_decode=True)
else:
    cfg = bench.qwen3_4b_config()
    params = q3.init_bench_params(cfg)
    rt = q3.make_runtime(cfg, params, num_pages=384, page_size=64)
print("model:", model, flush=True)
# PEGAINFER_MIXED_CHUNK: adaptive-chunking ablation knob (2048 = disabled,
# the pre-adaptive fixed-chunk policy; default 256 = contract.py default)
import os

mixed_chunk = int(os.environ.get("PEGAINFER_MIXED_CHUNK", "256"))
handle = start_scheduler(JaxExecutor(rt, EngineLoadOptions(
    prefill_chunk_mixed=mixed_chunk)))
print("prefill_chunk_mixed:", mixed_chunk, flush=True)
rng = np.random.default_rng(0)
t0 = time.time()


def decode_stream(n_tokens, prompt_len=512):
    req = GenerateRequest(
        prompt_tokens=rng.integers(0, cfg.vocab_size, prompt_len).tolist(),
        max_tokens=n_tokens, params=SamplingParams(ignore_eos=True))
    handle.submit(req)
    stamps = []
    for ev in req.channel:
        if isinstance(ev, Token):
            stamps.append(time.perf_counter())
        elif isinstance(ev, Finished):
            break
    return stamps


def tpot_stats(stamps, label):
    k = min(4, len(stamps) - 2)
    total = (stamps[-1] - stamps[k]) * 1e3 / (len(stamps) - 1 - k)
    gaps = sorted((b - a) * 1e3 for a, b in zip(stamps[k:], stamps[k + 1:]))
    # block-level worst gap = the longest stall an SSE consumer sees
    print(f"{label}: effective TPOT {total:6.2f} ms; worst token gap "
          f"{gaps[-1]:7.1f} ms; p95 gap {gaps[int(len(gaps) * 0.95)]:7.1f} ms",
          flush=True)
    return total


# warm compiles: solo stream + one 10k prefill, then one prefill WHILE a
# decode stream is active — adaptive chunking uses different (mixed-size)
# piece shapes under decode load, and compiling those mid-measurement
# shows up as a one-off multi-second "worst token gap" that isn't policy
decode_stream(32)
pf = GenerateRequest(
    prompt_tokens=rng.integers(0, cfg.vocab_size, 10_000).tolist(),
    max_tokens=1, params=SamplingParams(ignore_eos=True))
handle.submit(pf)
for ev in pf.channel:
    if isinstance(ev, Finished):
        break
wt = threading.Thread(target=decode_stream, args=(64,))
wt.start()
time.sleep(0.6)
pf2 = GenerateRequest(
    prompt_tokens=rng.integers(0, cfg.vocab_size, 10_000).tolist(),
    max_tokens=1, params=SamplingParams(ignore_eos=True))
handle.submit(pf2)
for ev in pf2.channel:
    if isinstance(ev, Finished):
        break
wt.join()
print(f"[+{time.time()-t0:.0f}s] warmup done", flush=True)

# 1) solo baseline
stamps = decode_stream(192)
solo = tpot_stats(stamps, "solo decode           ")

# 2) decode while 10k prefills keep arriving
stop = threading.Event()


def prefill_storm():
    while not stop.is_set():
        r = GenerateRequest(
            prompt_tokens=rng.integers(0, cfg.vocab_size, 10_000).tolist(),
            max_tokens=1, params=SamplingParams(ignore_eos=True))
        handle.submit(r)
        for ev in r.channel:
            if isinstance(ev, Finished):
                break


storm = threading.Thread(target=prefill_storm, daemon=True)
# start the decode FIRST so it is active when prefills arrive
result = {}


def run_decode():
    result["stamps"] = decode_stream(192)


dt = threading.Thread(target=run_decode)
dt.start()
time.sleep(0.6)  # let it pass its own prefill
storm.start()
dt.join()
stop.set()
mixed = tpot_stats(result["stamps"], "decode + 10k prefills ")
print(f"slowdown under continuous 10k-prefill load: {mixed / solo:.2f}x",
      flush=True)
handle.shutdown()
print("DONE in %.0fs" % (time.time() - t0), flush=True)
# the axon runtime can throw from a destructor during interpreter
# teardown (after all results are printed) — exit hard so the run's
# status reflects the measurement, not the teardown
os._exit(0)
