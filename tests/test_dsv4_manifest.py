"""mp8 manifest validation (reference: deepseek-v4/tests/mp8_manifest.rs).

The validator must accept a schema-correct checkpoint (the synthetic one
the e2e test serves) and pinpoint every class of corruption — missing
tensor, extra tensor, wrong shard shape, wrong dtype, wrong scale grid,
missing rank file — BEFORE any tensor bytes are read.
"""

import numpy as np
import pytest

from pegainfer_tpu.models import dsv4
from pegainfer_tpu.models.dsv4_manifest import (
    expected_rank_manifest,
    validate_checkpoint,
)
from tests.test_dsv4_engine import tiny_cfg_dict, write_fake_checkpoint


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    import json

    import jax.numpy as jnp

    tmp = tmp_path_factory.mktemp("dsv4_ckpt")
    with open(tmp / "config.json", "w") as f:
        json.dump(tiny_cfg_dict(), f)
    cfg = dsv4.DSv4Config.from_model_path(str(tmp))
    params = dsv4.init_random_params(cfg, seed=2, dtype=jnp.float32)
    write_fake_checkpoint(tmp, cfg, params)
    return cfg, tmp


def test_valid_checkpoint_passes(checkpoint):
    cfg, path = checkpoint
    assert validate_checkpoint(cfg, str(path)) == []
    assert validate_checkpoint(cfg, str(path), deep=True) == []


def test_manifest_covers_loader_reads(checkpoint):
    """Every tensor in the fixture is expected, and vice versa — the
    manifest and the loader cannot drift apart silently."""
    from pegainfer_tpu.models.dsv4_weights import SafetensorsReader, _rank_files

    cfg, path = checkpoint
    for rank, p in enumerate(_rank_files(str(path))):
        man = expected_rank_manifest(cfg, rank)
        assert set(SafetensorsReader(p).keys()) == set(man)


def test_missing_rank_file(checkpoint, tmp_path):
    import shutil

    cfg, path = checkpoint
    broken = tmp_path / "ckpt"
    shutil.copytree(path, broken)
    (broken / "mp8" / "model3-mp8.safetensors").unlink()
    errs = validate_checkpoint(cfg, str(broken))
    assert any("rank 3: missing file" in e for e in errs)


def _rewrite_rank(src, dst, rank, mutate):
    """Copy the checkpoint, round-tripping one rank file through a dict
    mutation (ml_dtypes-safe: reads via the repo's own reader)."""
    import shutil

    import jax.numpy as jnp
    from safetensors.flax import save_file

    from pegainfer_tpu.models.dsv4_weights import read_safetensors_raw

    shutil.copytree(src, dst)
    f = dst / "mp8" / f"model{rank}-mp8.safetensors"
    tensors = read_safetensors_raw(str(f))
    mutate(tensors)
    save_file({k: jnp.asarray(v) for k, v in tensors.items()}, str(f))


def test_missing_and_extra_tensor(checkpoint, tmp_path):
    cfg, path = checkpoint

    def mutate(t):
        del t["layers.0.attn.wq_a.weight"]
        t["layers.0.attn.bogus"] = np.zeros(3, np.float32)

    _rewrite_rank(path, tmp_path / "ckpt", 1, mutate)
    errs = validate_checkpoint(cfg, str(tmp_path / "ckpt"))
    assert any("rank 1: missing tensor layers.0.attn.wq_a.weight" in e
               for e in errs)
    assert any("rank 1: unexpected tensor layers.0.attn.bogus" in e
               for e in errs)


def test_wrong_shard_shape(checkpoint, tmp_path):
    cfg, path = checkpoint

    def mutate(t):
        # embed shard carries the WRONG number of vocab rows
        t["embed.weight"] = t["embed.weight"][:-1]

    _rewrite_rank(path, tmp_path / "ckpt", 0, mutate)
    errs = validate_checkpoint(cfg, str(tmp_path / "ckpt"))
    assert any("rank 0: embed.weight: shape" in e for e in errs)


def test_wrong_dtype(checkpoint, tmp_path):
    cfg, path = checkpoint

    def mutate(t):
        t["norm.weight"] = np.asarray(t["norm.weight"], np.float32)

    _rewrite_rank(path, tmp_path / "ckpt", 2, mutate)
    errs = validate_checkpoint(cfg, str(tmp_path / "ckpt"))
    assert any("rank 2: norm.weight: dtype F32" in e for e in errs)


def test_wrong_scale_grid(checkpoint, tmp_path):
    cfg, path = checkpoint

    def mutate(t):
        s = t["layers.0.attn.wq_a.scale"]
        t["layers.0.attn.wq_a.scale"] = np.concatenate([s, s], axis=0)

    _rewrite_rank(path, tmp_path / "ckpt", 0, mutate)
    errs = validate_checkpoint(cfg, str(tmp_path / "ckpt"))
    assert any("wq_a.scale: scale dim 0" in e for e in errs)


def test_replicated_divergence_deep(checkpoint, tmp_path):
    cfg, path = checkpoint

    def mutate(t):
        # keep the stored dtype (numpy promotes bf16 arithmetic to f32)
        t["norm.weight"] = np.zeros_like(t["norm.weight"])

    _rewrite_rank(path, tmp_path / "ckpt", 5, mutate)
    errs = validate_checkpoint(cfg, str(tmp_path / "ckpt"), deep=True)
    assert any("rank 5: replicated tensor norm.weight differs" in e
               for e in errs)
    # shallow validation accepts it (shape/dtype unchanged)
    assert validate_checkpoint(cfg, str(tmp_path / "ckpt")) == []


def test_loader_rejects_invalid(checkpoint, tmp_path):
    """load_params fails fast on a corrupted checkpoint (before reading any
    tensor bytes)."""
    cfg, path = checkpoint

    def mutate(t):
        del t["head.weight"]

    _rewrite_rank(path, tmp_path / "ckpt", 7, mutate)
    from pegainfer_tpu.models.dsv4_weights import load_params

    with pytest.raises(ValueError, match="manifest validation"):
        load_params(cfg, str(tmp_path / "ckpt"))


def test_world_divisibility_precondition():
    cfg = dsv4.DSv4Config(**{  # heads not divisible by 8
        "vocab_size": 128, "dim": 32, "moe_inter_dim": 16, "n_layers": 1,
        "num_attention_heads": 6, "head_dim": 16, "q_lora_rank": 16,
        "qk_rope_head_dim": 8, "o_groups": 8, "o_lora_rank": 4,
        "sliding_window": 8, "n_routed_experts": 8, "n_shared_experts": 1,
        "n_activated_experts": 2, "n_hash_layers": 1,
        "routed_scaling_factor": 1.5, "swiglu_limit": 7.0,
        "rms_norm_eps": 1e-6, "index_n_heads": 8, "index_head_dim": 16,
        "index_topk": 4, "max_position_embeddings": 4096,
        "rope_theta": 1e4, "compress_rope_theta": 1e4,
        "compress_ratios": (0,), "yarn_original_seq_len": 256,
        "yarn_factor": 4.0,
    })
    with pytest.raises(ValueError, match="heads"):
        expected_rank_manifest(cfg, 0)
