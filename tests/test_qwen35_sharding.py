"""Qwen3.5 TP sharding: greedy parity vs unsharded on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.test_qwen35_parity import tiny, run_prefill, greedy_generate_ours, MAX_SLOTS, CHUNK, PAGE_SIZE  # noqa: F401,E402
from pegainfer_tpu.models import qwen35 as q35  # noqa: E402
from pegainfer_tpu.parallel.sharding import MeshConfig, make_mesh, shard_qwen35  # noqa: E402


def test_tp2_greedy_parity(tiny):
    _, _, cfg, params, jitted = tiny
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, 255, size=7).tolist()
    base = greedy_generate_ours(cfg, jitted, prompt, 8)

    mesh = make_mesh(MeshConfig(dp=1, tp=2))
    state = q35.make_state(cfg, 64, PAGE_SIZE, MAX_SLOTS, kv_dtype=jnp.float32)
    params2, state2 = shard_qwen35(mesh, cfg, params, state)
    jitted2 = {
        "prefill": jax.jit(lambda s, t, sl, pt, slot: q35.prefill(
            cfg, params2, s, t, sl, pt, slot, gdn_chunk_size=CHUNK)),
        "prefill_all": jax.jit(lambda s, t, sl, pt, slot: q35.prefill(
            cfg, params2, s, t, sl, pt, slot, return_all_logits=True,
            gdn_chunk_size=CHUNK)),
        "decode": jax.jit(lambda s, t, p, pt, sl, slots: q35.decode(
            cfg, params2, s, t, p, pt, sl, slots)),
    }
    # greedy_generate_ours builds its own fresh state internally; pass the
    # sharded jitted fns (state created inside run_prefill is unsharded but
    # GSPMD re-shards on use)
    sharded = greedy_generate_ours(cfg, jitted2, prompt, 8)
    assert base == sharded
