"""DSv4 slot prefix cache: warm vs cold TTFT on the scaled config.

The cache stores whole-slot state snapshots (dsv4.slot_export) keyed by
the full prompt; an extending prompt imports the snapshot and runs only
the suffix through the scanned decode recurrence
(docs/prefix-cache-design.md "DSv4 slot prefix cache"). This probe
measures the shared-system-prompt shape the cache targets: a long base
prompt followed by requests that extend it with a short suffix.

Run: python scripts/dsv4_prefix_probe.py [--base 1024] [--suffix 16]
"""
import argparse
import faulthandler
import os
import pathlib
import sys
import time

faulthandler.dump_traceback_later(1800, exit=True)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax

import bench
from pegainfer_tpu.engine.contract import (
    EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import dsv4
from pegainfer_tpu.models.dsv4_engine import make_runtime as mk_dsv4

ap = argparse.ArgumentParser()
ap.add_argument("--base", type=int, default=1024)
ap.add_argument("--suffix", type=int, default=16)
ap.add_argument("--smoke", action="store_true",
                help="tiny config on the CPU backend (script logic check)")
args = ap.parse_args()

if args.smoke:
    # the env var does NOT override the baked axon plugin; only the
    # config flag set before first device use does (tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
print("backend:", jax.default_backend(), flush=True)
t0 = time.time()
cfg = bench.dsv4_smoke_config() if args.smoke else bench.dsv4_scaled_config()
params = dsv4.init_random_params(cfg, seed=0)
runtime = mk_dsv4(cfg, params, max_model_len=2048, max_slots=2)
ex = JaxExecutor(runtime, EngineLoadOptions())  # prefix cache on by default
assert ex.slot_prefix_cache is not None
handle = start_scheduler(ex)
print(f"[+{time.time()-t0:.0f}s] scheduler up", flush=True)
rng = np.random.default_rng(0)


def ttft(prompt):
    req = GenerateRequest(prompt_tokens=list(prompt), max_tokens=2,
                          params=SamplingParams(ignore_eos=True))
    t = time.perf_counter()
    handle.submit(req)
    first = None
    for ev in req.channel:
        if isinstance(ev, Token) and first is None:
            first = time.perf_counter() - t
        elif isinstance(ev, Finished):
            break
    return first * 1e3


# warmup: compile the prefill bucket and the resume scan on a throwaway
# prompt family, so measured TTFTs are execution, not compile
wbase = rng.integers(0, cfg.vocab_size, args.base).tolist()
ttft(wbase)
ttft(wbase + rng.integers(0, cfg.vocab_size, args.suffix).tolist())
print(f"[+{time.time()-t0:.0f}s] warmup done (hits={ex.slot_prefix_cache.hits})",
      flush=True)

base = rng.integers(0, cfg.vocab_size, args.base).tolist()
cold_base = ttft(base)  # also populates the cache for the extension below
hits0 = ex.slot_prefix_cache.hits
warm = [ttft(base + rng.integers(0, cfg.vocab_size, args.suffix).tolist())
        for _ in range(3)]
assert ex.slot_prefix_cache.hits == hits0 + 3, "resume path did not fire"
full = base + rng.integers(0, cfg.vocab_size, args.suffix).tolist()
ex.slot_prefix_cache.clear()
cold_full = ttft(full)

print(f"base {args.base} tok cold TTFT: {cold_base:8.1f} ms", flush=True)
print(f"+{args.suffix}-tok suffix, cold : {cold_full:8.1f} ms", flush=True)
print(f"+{args.suffix}-tok suffix, warm : {min(warm):8.1f} ms "
      f"(3 runs: {', '.join(f'{w:.1f}' for w in warm)}) — "
      f"{cold_full / min(warm):.1f}x", flush=True)
print("DONE in %.0fs" % (time.time() - t0), flush=True)
handle.shutdown()
os._exit(0)  # axon teardown can throw after results are out
