"""Multi-host bring-up module (degenerate single-process coverage).

Real multi-host hardware does not exist in this environment; these pin the
single-process behavior (no-op initialize, global mesh construction, and a
tp-sharded step over the mesh the module builds) so the bring-up path is
CI-covered. parallel/multihost.py documents the launch pattern.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pegainfer_tpu.parallel import multihost


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("PEGAINFER_COORD", raising=False)
    monkeypatch.delenv("PEGAINFER_NUM_PROCS", raising=False)
    assert multihost.initialize() is False
    assert multihost.is_coordinator()


def test_global_mesh_shapes():
    mesh = multihost.global_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = multihost.global_mesh(dp=2)  # tp inferred = all/2
    assert mesh.shape["tp"] == jax.device_count() // 2


def test_step_over_global_mesh():
    """A tp-sharded Qwen3 prefill runs over the module's mesh (the same
    global-array program that would span hosts)."""
    from pegainfer_tpu.models import qwen3 as q3
    from pegainfer_tpu.parallel.sharding import shard_qwen3

    cfg = q3.Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, head_dim=16,
        vocab_size=128, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=True, eos_token_id=1, stop_token_ids=(1,),
        max_position_embeddings=512,
    )
    params = q3.init_random_params(cfg, seed=7, dtype=jnp.float32)
    kv = q3.make_kv_pages(cfg, 16, 4, dtype=jnp.float32)
    toks = jnp.asarray(np.arange(8) + 3, jnp.int32)
    table = jnp.asarray([1, 2], jnp.int32)
    _, ref, _ = q3.prefill(cfg, params, kv, toks, jnp.int32(8), table)

    mesh = multihost.global_mesh(tp=8)
    kv2 = q3.make_kv_pages(cfg, 16, 4, dtype=jnp.float32)
    params_s, kv2 = shard_qwen3(mesh, cfg, params, kv2)
    _, out, _ = q3.prefill(cfg, params_s, kv2, toks, jnp.int32(8), table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_two_process_engine_parity():
    """Two OS processes (jax.distributed, 4 virtual CPU devices each) run
    the replicated-driver engine over one 8-device global mesh; greedy
    tokens match a single-process run (VERDICT r2 #5 / scripts/
    multihost_two_proc.py). Reference analog: the 8-rank worker bootstrap
    (deepseek-v4/src/direct/worker.rs:38-110)."""
    import subprocess
    import sys
    import pathlib

    script = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "multihost_two_proc.py"
    r = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, timeout=570)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    assert "TWO-PROCESS PARITY OK" in r.stdout
