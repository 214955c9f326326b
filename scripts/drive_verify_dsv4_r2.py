"""Drive: DSv4 mp8 loader (manifest-gated) + EP a2a MoE on the real TPU.

1. Writes a tiny schema-correct mp8 checkpoint, validates its manifest,
   loads it quantized-resident, and generates through the real engine.
2. Re-serves with expert-parallel MoE enabled on a 1-device mesh with the
   RAGGED transport — the real-chip exercise of lax.ragged_all_to_all
   (XLA:CPU has no thunk for it; this is the degenerate-world check the
   ragged wire path gets before multi-chip hardware exists).
3. Corrupts the checkpoint and confirms the loader fails fast.

Run: python scripts/drive_verify_dsv4_r2.py
"""
import faulthandler
import json
import pathlib
import sys
import tempfile
import time

faulthandler.dump_traceback_later(900, exit=True)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pegainfer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
)
from pegainfer_tpu.engine.jax_executor import JaxExecutor
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import dsv4, dsv4_engine
from pegainfer_tpu.models.dsv4_manifest import validate_checkpoint
from tests.test_dsv4_engine import tiny_cfg_dict, write_fake_checkpoint

print("backend:", jax.default_backend(), flush=True)
t0 = time.time()

tmp = pathlib.Path(tempfile.mkdtemp())
(tmp / "config.json").write_text(json.dumps(tiny_cfg_dict()))
cfg = dsv4.DSv4Config.from_model_path(str(tmp))
params_f32 = dsv4.init_random_params(cfg, seed=3, dtype=jnp.float32)
write_fake_checkpoint(tmp, cfg, params_f32)
assert validate_checkpoint(cfg, str(tmp), deep=True) == []
print(f"[+{time.time()-t0:.0f}s] checkpoint written + manifest valid", flush=True)


def generate(engine, prompt, n):
    r = GenerateRequest(prompt_tokens=list(prompt), max_tokens=n,
                        params=SamplingParams(ignore_eos=True))
    engine.submit(r)
    toks = []
    for ev in r.channel:
        if isinstance(ev, Token):
            toks.append(ev.id)
        elif isinstance(ev, Finished):
            break
    return toks


# 1) quantized-resident serve through start_engine (loader path end-to-end)
engine = dsv4_engine.start_engine(str(tmp), EngineLoadOptions())
toks_base = generate(engine, list(range(2, 14)), 6)
engine.shutdown()
assert len(toks_base) == 6
print(f"[+{time.time()-t0:.0f}s] resident serve OK: {toks_base}", flush=True)

# 2) EP ragged transport on the real chip (1-device mesh degenerate)
from pegainfer_tpu.models.dsv4_weights import load_params

params_q = load_params(cfg, str(tmp))
runtime = dsv4_engine.make_runtime(cfg, params_q, max_model_len=64,
                                   max_slots=2)
assert dsv4_engine.maybe_enable_moe_ep(cfg, runtime, mode="ragged")
engine = start_scheduler(JaxExecutor(runtime, EngineLoadOptions()))
toks_ep = generate(engine, list(range(2, 14)), 6)
engine.shutdown()
dsv4.clear_moe_ep()
assert toks_ep == toks_base, (toks_ep, toks_base)
print(f"[+{time.time()-t0:.0f}s] EP ragged a2a serve OK (tokens match): "
      f"{toks_ep}", flush=True)

# 3) corrupted checkpoint fails fast
f = tmp / "mp8" / "model0-mp8.safetensors"
f.rename(tmp / "mp8" / "model0-mp8.safetensors.bak")
try:
    load_params(cfg, str(tmp))
    raise SystemExit("loader accepted a corrupted checkpoint")
except ValueError as e:
    assert "manifest validation" in str(e)
print(f"[+{time.time()-t0:.0f}s] corrupted checkpoint rejected", flush=True)
print("DRIVE PASSED in %.1fs" % (time.time() - t0), flush=True)
