"""Shard-wise DSv4 mp8 load (VERDICT r2 #1): no leaf ever materializes
unsharded, per-device bytes ≈ total/8, and the MP8 mesh is built inside
start_engine (honoring tp_size).

Reference analog: each mp8 rank loads its own file straight onto its own
GPU (deepseek-v4/src/weights.rs:17-100, direct/worker.rs:38-110).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions,
    GenerateRequest,
    SamplingParams,
    Token,
)
from pegainfer_tpu.models import dsv4, dsv4_engine, dsv4_weights
from pegainfer_tpu.parallel.sharding import DSV4_LAYER_SHARDED

from tests.test_dsv4_engine import tiny_cfg_dict, write_fake_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dsv4_sharded")
    cfg = dsv4.DSv4Config(
        vocab_size=128, dim=32, moe_inter_dim=16, n_layers=2,
        num_attention_heads=8, head_dim=16, q_lora_rank=16,
        qk_rope_head_dim=8, o_groups=8, o_lora_rank=4, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=16, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4, compress_rope_theta=1e4,
        compress_ratios=(0, 4), yarn_original_seq_len=256, yarn_factor=4.0,
    )
    params = dsv4.init_random_params(cfg, seed=5, dtype=jnp.float32,
                                     scale=0.08)
    write_fake_checkpoint(tmp, cfg, params)
    return cfg, tmp


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("tp",))


def _leaf_bytes(leaf):
    bits = (jnp.finfo(leaf.dtype).bits
            if jnp.issubdtype(leaf.dtype, jnp.floating)
            else jnp.iinfo(leaf.dtype).bits)
    return leaf.size * bits // 8


def _shard_bytes(leaf):
    shard_shape = leaf.sharding.shard_shape(leaf.shape)
    bits = (jnp.finfo(leaf.dtype).bits
            if jnp.issubdtype(leaf.dtype, jnp.floating)
            else jnp.iinfo(leaf.dtype).bits)
    return int(np.prod(shard_shape)) * bits // 8


def test_sharded_load_matches_unsharded(ckpt):
    """Every leaf of the shard-wise load equals the reassemble-then-group
    oracle, for both resident and dequant modes (pins the two loaders'
    schemas to each other)."""
    cfg, path = ckpt
    mesh = _mesh(8)
    for resident in (True, False):
        oracle = dsv4.group_params(
            cfg, dsv4_weights.load_params(cfg, str(path), resident=resident))
        sharded = dsv4_weights.load_params_sharded(
            cfg, str(path), mesh, resident=resident)
        fo, to = jax.tree.flatten(oracle)
        fs, ts = jax.tree.flatten(sharded)
        assert to == ts
        for a, b in zip(fo, fs):
            assert a.dtype == b.dtype, (a.dtype, b.dtype)
            np.testing.assert_array_equal(
                np.asarray(a, np.float32) if a.dtype != jnp.uint8
                else np.asarray(a),
                np.asarray(b, np.float32) if b.dtype != jnp.uint8
                else np.asarray(b),
            )


def test_sharded_load_balance_and_no_unsharded_leaf(ckpt):
    """The MP8-sharded leaves split 8 ways (shard bytes = total/8); every
    leaf is committed to the mesh (no default-device placement), so peak
    per-device HBM at load is ≈ total/8 + small replicated tensors."""
    cfg, path = ckpt
    mesh = _mesh(8)
    gp = dsv4_weights.load_params_sharded(cfg, str(path), mesh)

    sharded_keys = set(DSV4_LAYER_SHARDED) | {"embed", "head"}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from walk(v, f"{prefix}/{k}")
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                yield from walk(v, f"{prefix}[{i}]")
        else:
            yield prefix, tree

    total = dev0 = sharded_total = 0
    for name, leaf in walk(gp):
        # every leaf committed to the full 8-device mesh
        assert len(leaf.sharding.device_set) == 8, name
        total += _leaf_bytes(leaf)
        dev0 += _shard_bytes(leaf)
        base = name.rsplit("/", 2)
        key = base[-2] if base[-1] in ("q", "s") else base[-1]
        key = key.split("[")[0]
        if key in sharded_keys and not (base[-1] == "s" and key.startswith("w")):
            # weight leaves of the mp8-sharded tensors split 8 ways
            # (fp8 scale grids are replicated by design: bytes ≤ 1/64)
            if base[-1] == "s" and leaf.ndim < 4:
                continue
            assert _shard_bytes(leaf) * 8 == _leaf_bytes(leaf), name
            sharded_total += _leaf_bytes(leaf)

    # exact per-device accounting: everything not in the mp8 shard set is
    # replicated. (At real 671B scale the expert stacks dominate, so
    # dev0 → total/8; this tiny fixture is replicated-heavy by shape.)
    assert dev0 == total - sharded_total * 7 // 8, (dev0, total, sharded_total)
    assert sharded_total > 0.25 * total  # experts/embeds shard even here


def test_sharded_load_sub_world_mesh(ckpt):
    """tp=2 folds 4 checkpoint ranks per device — same values."""
    cfg, path = ckpt
    oracle = dsv4.group_params(cfg, dsv4_weights.load_params(cfg, str(path)))
    sharded = dsv4_weights.load_params_sharded(cfg, str(path), _mesh(2))
    fo, _ = jax.tree.flatten(oracle)
    fs, _ = jax.tree.flatten(sharded)
    for a, b in zip(fo, fs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolve_tp_size():
    assert dsv4_engine.resolve_tp_size(None, 8) == 8
    assert dsv4_engine.resolve_tp_size(None, 16) == 8
    assert dsv4_engine.resolve_tp_size(None, 4) == 4
    assert dsv4_engine.resolve_tp_size(None, 3) == 2
    assert dsv4_engine.resolve_tp_size(None, 1) == 1
    assert dsv4_engine.resolve_tp_size(2, 8) == 2
    with pytest.raises(ValueError):
        dsv4_engine.resolve_tp_size(3, 8)
    with pytest.raises(ValueError):
        dsv4_engine.resolve_tp_size(8, 4)


def test_engine_mp8_tokens_match_single_device(ckpt):
    """start_engine default (auto tp=8 on this mesh) serves the same greedy
    tokens as the tp=1 engine — the VERDICT item's done-condition."""
    cfg, path = ckpt

    def run(tp):
        handle = dsv4_engine.start_engine(
            str(path),
            EngineLoadOptions(precompile=False, max_batch_size=2,
                              max_model_len=64),
            tp_size=tp,
        )
        try:
            req = GenerateRequest(
                prompt_tokens=[3, 17, 42, 9, 88], max_tokens=6,
                params=SamplingParams(ignore_eos=True),
            )
            handle.submit(req)
            return [ev.id for ev in req.channel if isinstance(ev, Token)]
        finally:
            handle.shutdown()

    toks8 = run(None)  # auto → 8 on the virtual mesh
    toks1 = run(1)
    assert len(toks8) == 6
    assert toks8 == toks1
