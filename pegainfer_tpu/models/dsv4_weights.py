"""DeepSeek-V4 mp8 checkpoint loader.

Reference layout (deepseek-v4/src/weights.rs:128-166 + src/model.rs schema):
``<model>/mp8/model{rank}-mp8.safetensors`` for ranks 0..7, with vocab /
attention-head / o-group / index-head / expert shards per rank and
replicated norms, hc tensors, compressors, gates, and shared experts.

This loader reassembles the full-model pytree used by models/dsv4 (FP8/FP4
tensors dequantized to bf16; the quantized-in-HBM path reuses
ops/quant dequant linears when memory demands it). Under GSPMD the
re-assembled tensors are placed with the MP8 PartitionSpecs — the sharding
axes are exactly the reference's (vocab/heads/groups/experts), so each TPU
shard holds the same bytes a reference GPU rank held.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from pegainfer_tpu.models.dsv4 import DSv4Config
from pegainfer_tpu.ops import quant

WORLD = 8


def _rank_files(model_path: str) -> List[str]:
    return [
        os.path.join(model_path, "mp8", f"model{r}-mp8.safetensors")
        for r in range(WORLD)
    ]


_F4_LUT = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0], np.float32
)


def read_safetensors_raw(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader: the Python bindings in this environment
    cannot materialize F8/E8M0/F4 tensors (numpy lacks the dtypes they
    getattr for), so parse the header and view the bytes with ml_dtypes.
    Packed F4 (two E2M1 nibbles per byte, low nibble first) decodes via LUT.
    """
    import json as _json

    import ml_dtypes

    dtype_map = {
        "BF16": ml_dtypes.bfloat16,
        "F16": np.float16,
        "F32": np.float32,
        "F64": np.float64,
        "I32": np.int32,
        "I64": np.int64,
        "U8": np.uint8,
        "F8_E4M3": ml_dtypes.float8_e4m3fn,
        "F8_E8M0": ml_dtypes.float8_e8m0fnu,
    }
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = _json.loads(f.read(n))
        data = f.read()
    for name, info in header.items():
        if name == "__metadata__":
            continue
        st, en = info["data_offsets"]
        buf = data[st:en]
        shape = info["shape"]
        dt = info["dtype"]
        if dt in ("F4", "F4_E2M1", "F4_E2M1_X2"):
            raw = np.frombuffer(buf, np.uint8)
            lo = _F4_LUT[raw & 0xF]
            hi = _F4_LUT[raw >> 4]
            vals = np.stack([lo, hi], axis=-1).reshape(-1)
            out[name] = vals[: int(np.prod(shape))].reshape(shape)
        else:
            out[name] = np.frombuffer(buf, dtype_map[dt]).reshape(shape)
    return out


def load_params(cfg: DSv4Config, model_path: str, tp_size: int = 1,
                dtype=jnp.bfloat16) -> Dict[str, Any]:
    ranks = [read_safetensors_raw(p) for p in _rank_files(model_path)]

    def rep(name):  # replicated tensor: take rank 0
        return np.asarray(ranks[0][name])

    def cat(name, axis=0):  # sharded: concatenate ranks
        return np.concatenate([np.asarray(r[name]) for r in ranks], axis=axis)

    def fp8(prefix, sharded: bool, axis: int = 0):
        if sharded:
            parts = [
                np.asarray(
                    quant.dequant_fp8_blocks(
                        jnp.asarray(r[f"{prefix}.weight"]),
                        jnp.asarray(r[f"{prefix}.scale"]),
                        dtype=jnp.float32,
                    )
                )
                for r in ranks
            ]
            return np.concatenate(parts, axis=axis)
        r = ranks[0]
        return np.asarray(
            quant.dequant_fp8_blocks(
                jnp.asarray(r[f"{prefix}.weight"]),
                jnp.asarray(r[f"{prefix}.scale"]), dtype=jnp.float32,
            )
        )

    def fp4(r, prefix):
        return np.asarray(
            quant.dequant_fp4_groups(
                jnp.asarray(r[f"{prefix}.weight"]),
                jnp.asarray(r[f"{prefix}.scale"]), dtype=jnp.float32,
            )
        )

    def cast(x, keep_f32=False):
        return jnp.asarray(x, jnp.float32 if keep_f32 else dtype)

    E_loc = cfg.n_routed_experts // WORLD
    layers = []
    for li in range(cfg.n_layers):
        pre = f"layers.{li}"
        ratio = cfg.compress_ratios[li]
        lw: Dict[str, Any] = {
            "attn_norm": cast(rep(f"{pre}.attn_norm.weight")),
            "ffn_norm": cast(rep(f"{pre}.ffn_norm.weight")),
            "hc_attn_fn": cast(rep(f"{pre}.hc_attn_fn"), True),
            "hc_attn_base": cast(rep(f"{pre}.hc_attn_base"), True),
            "hc_attn_scale": cast(rep(f"{pre}.hc_attn_scale"), True),
            "hc_ffn_fn": cast(rep(f"{pre}.hc_ffn_fn"), True),
            "hc_ffn_base": cast(rep(f"{pre}.hc_ffn_base"), True),
            "hc_ffn_scale": cast(rep(f"{pre}.hc_ffn_scale"), True),
            "attn_sink": cast(cat(f"{pre}.attn.attn_sink"), True),
            "q_norm": cast(rep(f"{pre}.attn.q_norm.weight")),
            "kv_norm": cast(rep(f"{pre}.attn.kv_norm.weight")),
            "wq_a": cast(fp8(f"{pre}.attn.wq_a", sharded=False)),
            "wq_b": cast(fp8(f"{pre}.attn.wq_b", sharded=True)),
            "wkv": cast(fp8(f"{pre}.attn.wkv", sharded=False)),
            "wo_a": cast(cat(f"{pre}.attn.wo_a.weight")),
            # wo_b shards on its INPUT axis (each rank holds its o-groups'
            # lora columns, model.rs wo_b: [dim, local_groups*o_lora])
            "wo_b": cast(fp8(f"{pre}.attn.wo_b", sharded=True, axis=1)),
            "gate_weight": cast(rep(f"{pre}.ffn.gate.weight")),
            "shared_w1": cast(fp8(f"{pre}.ffn.shared_experts.w1", False)),
            "shared_w2": cast(fp8(f"{pre}.ffn.shared_experts.w2", False)),
            "shared_w3": cast(fp8(f"{pre}.ffn.shared_experts.w3", False)),
        }
        if li < cfg.n_hash_layers:
            lw["gate_tid2eid"] = jnp.asarray(
                rep(f"{pre}.ffn.gate.tid2eid"), jnp.int32
            )
        else:
            lw["gate_bias"] = cast(rep(f"{pre}.ffn.gate.bias"), True)

        for name in ("w1", "w2", "w3"):
            parts = []
            for rank, r in enumerate(ranks):
                for le in range(E_loc):
                    ge = rank * E_loc + le
                    parts.append(fp4(r, f"{pre}.ffn.experts.{ge}.{name}"))
            lw[f"experts_{name}"] = cast(np.stack(parts))

        if ratio > 0:
            cp = f"{pre}.attn.compressor"
            lw["comp"] = {
                "ape": cast(rep(f"{cp}.ape"), True),
                "wkv": cast(rep(f"{cp}.wkv.weight")),
                "wgate": cast(rep(f"{cp}.wgate.weight")),
                "norm": cast(rep(f"{cp}.norm.weight")),
            }
        if ratio == 4:
            ip = f"{pre}.attn.indexer"
            lw["idx_wq_b"] = cast(fp8(f"{ip}.wq_b", sharded=True))
            lw["idx_weights_proj"] = cast(cat(f"{ip}.weights_proj.weight"))
            icp = f"{ip}.compressor"
            lw["idx_comp"] = {
                "ape": cast(rep(f"{icp}.ape"), True),
                "wkv": cast(rep(f"{icp}.wkv.weight")),
                "wgate": cast(rep(f"{icp}.wgate.weight")),
                "norm": cast(rep(f"{icp}.norm.weight")),
            }
        layers.append(lw)

    return {
        "embed": cast(cat("embed.weight")),
        "head": cast(cat("head.weight")),
        "norm": cast(rep("norm.weight")),
        "hc_head_fn": cast(rep("hc_head_fn"), True),
        "hc_head_base": cast(rep("hc_head_base"), True),
        "hc_head_scale": cast(rep("hc_head_scale"), True),
        "layers": layers,
    }
