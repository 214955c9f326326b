"""Mesh construction + Qwen3 partition specs (megatron-style TP under GSPMD).

Sharding layout (the GSPMD analog of the reference's row/col TP shard loaders,
pegainfer-qwen3-4b/src/weights.rs:121-291):

- q/k/v projections `[L, D, H*hd]` — shard the *output* (head) axis over tp
  (reference "row shard" in its [out, in] layout);
- o projection `[L, H*hd, D]` — shard the *input* (head) axis over tp
  (reference "col shard"); XLA inserts the psum the reference issued as an
  explicit NCCL all-reduce after o_proj (batch_decode.rs:266);
- gate/up `[L, D, 2I]` and down `[L, I, D]` — same pattern over the
  intermediate axis (all-reduce after down_proj, batch_decode.rs:292);
- lm_head `[D, V]` — vocab-sharded; logits come back replicated via XLA
  all-gather (reference: embedding_batched_vocab_shard + logits gather);
- KV pages `[L, 2, pages, page_size, Hkv, hd]` — sharded on the kv-head axis,
  so paged attention is fully local per tp rank (GQA groups never cross
  ranks; requires tp | Hkv, same constraint the reference validates in
  TensorParallelConfig, config.rs:8-158);
- batch axes of the decode step — sharded over dp when the mesh has one.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshConfig:
    """Logical mesh axes. tp rides the innermost (fastest ICI) axis."""

    dp: int = 1
    tp: int = 1

    @property
    def size(self) -> int:
        return self.dp * self.tp


def make_mesh(cfg: MeshConfig, devices: Optional[list] = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if len(devs) < cfg.size:
        raise ValueError(f"need {cfg.size} devices, have {len(devs)}")
    arr = np.asarray(devs[: cfg.size]).reshape(cfg.dp, cfg.tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def qwen3_param_specs(cfg) -> dict:
    """PartitionSpec pytree matching models.qwen3 params layout."""
    return {
        "embed": P(None, None),  # replicated: gathers are tiny, avoids a
        # per-token all-gather on the embedding row
        "layers": {
            "input_ln": P(None, None),
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "wo": P(None, "tp", None),
            "post_ln": P(None, None),
            "w_gate_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        },
        "final_ln": P(None),
        "lm_head": P(None, "tp"),
    }


def qwen3_kv_spec() -> P:
    """KV block array [L, Hkv, pages, 2, page_size, hd]: shard kv heads."""
    return P(None, "tp", None, None, None, None)


def validate_qwen3_tp(cfg, tp: int) -> None:
    """The reference's TensorParallelConfig validation (config.rs:8-158)."""
    if cfg.num_key_value_heads % tp:
        raise ValueError(f"tp={tp} must divide num_key_value_heads={cfg.num_key_value_heads}")
    if cfg.num_attention_heads % tp:
        raise ValueError(f"tp={tp} must divide num_attention_heads={cfg.num_attention_heads}")
    if cfg.intermediate_size % tp:
        raise ValueError(f"tp={tp} must divide intermediate_size={cfg.intermediate_size}")
    if cfg.vocab_size % tp:
        raise ValueError(f"tp={tp} must divide vocab_size={cfg.vocab_size}")


def shard_qwen3(mesh: Mesh, cfg, params, kv_pages):
    """Place params + KV on the mesh with TP shardings. Returns (params, kv)."""
    tp = mesh.shape.get("tp", 1)
    validate_qwen3_tp(cfg, tp)
    specs = qwen3_param_specs(cfg)
    params = place_tree(mesh, params, specs)
    kv_pages = jax.device_put(kv_pages, NamedSharding(mesh, qwen3_kv_spec()))
    return params, kv_pages


def place_tree(mesh: Mesh, params, specs):
    """device_put leaves of a dict/list-pytree by matching PartitionSpec
    leaves.

    (Not jax.tree.map: PartitionSpec subclasses tuple, so tree_map would
    recurse into the spec itself.)
    """
    if isinstance(params, dict):
        if set(params.keys()) == {"q8", "s"} and not isinstance(specs, dict):
            # int8 weight-only leaf ({q8: [..., in, out], s: [..., out]}):
            # the matrix spec applies to q8; the scale drops the input axis
            sp = tuple(specs)
            s_spec = P(*(sp[:-2] + sp[-1:])) if len(sp) >= 2 else P()
            return {
                "q8": jax.device_put(params["q8"], NamedSharding(mesh, specs)),
                "s": jax.device_put(params["s"], NamedSharding(mesh, s_spec)),
            }
        if set(params.keys()) == {"q", "s"} and not isinstance(specs, dict):
            # quantized-resident fp8/fp4 leaf (ops/quant.py containers):
            # the matrix spec shards q; the scale keeps any leading
            # batch/expert-axis sharding but REPLICATES its last two (block
            # grid) axes — scale bytes are ≤1/64 of the weight and grid
            # dims (e.g. [2,2] for a 256x256 fp8 tensor) generally cannot
            # divide the mesh axes.
            sp = tuple(specs)
            if len(sp) == params["s"].ndim and len(sp) >= 2:
                s_spec = P(*(sp[:-2] + (None, None)))
            else:
                s_spec = P()
            return {
                "q": jax.device_put(params["q"], NamedSharding(mesh, specs)),
                "s": jax.device_put(params["s"], NamedSharding(mesh, s_spec)),
            }
        return {k: place_tree(mesh, params[k], specs[k]) for k in params}
    if isinstance(params, (list, tuple)):
        return type(params)(
            place_tree(mesh, p, s) for p, s in zip(params, specs)
        )
    return jax.device_put(params, NamedSharding(mesh, specs))


# ── Qwen3.5 hybrid specs ─────────────────────────────────────────────────
# Shard the linear-attention value heads (Hv) and full-attention heads over
# tp; requires tp | {Hk, Hv, Hkv, intermediate, vocab}. conv channels are
# sharded blockwise (depthwise conv is per-channel, any split is exact).


def qwen35_param_specs(cfg) -> dict:
    lin = {
        "input_ln": P(None, None, None),
        "wq": P(None, None, None, "tp"),
        "wk": P(None, None, None, "tp"),
        "wv": P(None, None, None, "tp"),
        "wz": P(None, None, None, "tp"),
        "wb": P(None, None, None, "tp"),
        "wa": P(None, None, None, "tp"),
        "conv_w": P(None, None, "tp", None),
        "dt_bias": P(None, None, "tp"),
        "A_log": P(None, None, "tp"),
        "norm_w": P(None, None, None),
        "out_proj": P(None, None, "tp", None),
        "post_ln": P(None, None, None),
        "mlp_gate_up": P(None, None, None, "tp"),
        "mlp_down": P(None, None, "tp", None),
    }
    full = {
        "input_ln": P(None, None),
        "wq": P(None, None, "tp"),
        "wgate": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "q_norm": P(None, None),
        "k_norm": P(None, None),
        "wo": P(None, "tp", None),
        "post_ln": P(None, None),
        "mlp_gate_up": P(None, None, "tp"),
        "mlp_down": P(None, "tp", None),
    }
    return {
        "embed": P(None, None),
        "lin": lin,
        "full": full,
        "final_ln": P(None),
        "lm_head": P(None, "tp"),
    }


def qwen35_state_specs() -> dict:
    return {
        "kv": P(None, "tp", None, None, None, None),   # [G,Hkv,pages,2,ps,hd]→kv heads
        "rec": P(None, None, None, "tp", None, None),  # [G,pl,S,Hv,dk,dv]→v heads
        "conv": P(None, None, None, None, "tp"),       # [G,pl,S,K,conv_dim]→channels
    }


def validate_qwen35_tp(cfg, tp: int) -> None:
    for name, v in (
        ("linear_num_key_heads", cfg.linear_num_key_heads),
        ("linear_num_value_heads", cfg.linear_num_value_heads),
        ("num_attention_heads", cfg.num_attention_heads),
        ("num_key_value_heads", cfg.num_key_value_heads),
        ("intermediate_size", cfg.intermediate_size),
        ("vocab_size", cfg.vocab_size),
    ):
        if v % tp:
            raise ValueError(f"tp={tp} must divide {name}={v}")


def shard_qwen35(mesh: Mesh, cfg, params, state):
    tp = mesh.shape.get("tp", 1)
    validate_qwen35_tp(cfg, tp)
    specs = qwen35_param_specs(cfg)
    params = place_tree(mesh, params, specs)
    state = place_tree(mesh, state, qwen35_state_specs())
    return params, state


def qwen35_union_specs(u) -> dict:
    """TP placement for the flat UNION layout (models/qwen35.to_union):
    packed output-width slots shard on the width axis, input-packed a4/dn
    on the input axis; the small per-head vectors and conv replicate.
    GSPMD keeps the packed sub-slot slices exact (parity pinned by
    tests/test_qwen35_tp_flat.py); sub-slot components narrower than a
    shard (full layers' wk/wv in a3) place unevenly — acceptable until a
    real multi-chip measurement exists (PEGAINFER_Q35_FLAT_TP opt-in)."""
    mat = {"a1": P(None, None, "tp"), "a2": P(None, None, "tp"),
           "a3": P(None, None, "tp"), "gu": P(None, None, "tp"),
           "a4": P(None, "tp", None), "dn": P(None, "tp", None)}
    return {k: mat.get(k, P()) for k in u}


def shard_qwen35_union(mesh: Mesh, cfg, params, state):
    assert "union" in params, "shard_qwen35_union needs to_union params"
    tp = mesh.shape.get("tp", 1)
    validate_qwen35_tp(cfg, tp)
    specs = {
        "embed": P(None, None), "final_ln": P(),
        "lm_head": P(None, "tp"),
        "union": qwen35_union_specs(params["union"]),
    }
    params = place_tree(mesh, params, {k: specs[k] for k in params})
    state = place_tree(mesh, state, qwen35_state_specs())
    return params, state


# ── DeepSeek-V4 MP8 specs ────────────────────────────────────────────────
# The sharding axes are exactly the reference's mp8 rank split
# (deepseek-v4/src/config.rs TensorParallelConfig: vocab / attention heads /
# o-groups / index heads / routed experts over 8 ranks); NCCL collectives
# become XLA psum/all-gather inside the jitted step.


# Per-layer shard axes = the reference's mp8 rank split (single source of
# truth for dsv4_layer_specs AND the shard-wise loader,
# models/dsv4_weights.load_params_sharded).
DSV4_LAYER_SHARDED = {
    "attn_sink": P("tp"),
    "wq_b": P("tp", None),
    "wo_a": P("tp", None),
    "wo_b": P(None, "tp"),
    "idx_wq_b": P("tp", None),
    "idx_weights_proj": P("tp", None),
    "experts_w1": P("tp", None, None),
    "experts_w2": P("tp", None, None),
    "experts_w3": P("tp", None, None),
}


def dsv4_layer_specs(lw: dict) -> dict:
    sharded = DSV4_LAYER_SHARDED
    out = {}
    for k, v in lw.items():
        if isinstance(v, dict) and set(v.keys()) == {"q", "s"}:
            # quantized-resident container: spec resolved in place_tree
            out[k] = sharded.get(k, P())
        elif isinstance(v, dict):  # compressors: replicated
            out[k] = {kk: P() for kk in v}
        else:
            out[k] = sharded.get(k, P())
    return out


def dsv4_param_specs(params: dict) -> dict:
    return {
        "embed": P("tp", None),
        "head": P("tp", None),
        "norm": P(),
        "hc_head_fn": P(),
        "hc_head_base": P(),
        "hc_head_scale": P(),
        "layers": [dsv4_layer_specs(lw) for lw in params["layers"]],
    }


def dsv4_state_specs(state: dict) -> dict:
    """Decode caches are replicated (MQA: one joint KV shared by all head
    shards — the reference's ranks each hold the full kv too)."""
    return {
        "layers": [{k: P() for k in ls} for ls in state["layers"]]
    }


def shard_dsv4(mesh: Mesh, params, state=None):
    params = place_tree(mesh, params, dsv4_param_specs(params))
    if state is not None:
        state = place_tree(mesh, state, dsv4_state_specs(state))
    return params, state


def dsv4_grouped_param_specs(gparams: dict) -> dict:
    """Specs for the segment-grouped params layout (dsv4.group_params):
    per-layer specs gain a leading None for the stacked layer axis."""
    def prep(spec):
        t = tuple(spec)
        return P(None, *t) if t else P()

    seg_specs = []
    for seg in gparams["segments"]:
        base = dsv4_layer_specs(seg)
        seg_specs.append({
            k: ({kk: P() for kk in v} if isinstance(v, dict) else prep(v))
            for k, v in base.items()
        })
    top = dsv4_param_specs({"layers": []})
    return {**{k: v for k, v in top.items() if k != "layers"},
            "segments": seg_specs}


def shard_dsv4_grouped(mesh: Mesh, gparams, gstate=None):
    """Place a segment-grouped DSv4 runtime (the serving layout) with the
    MP8 specs — the multichip form the engine actually runs."""
    gparams = place_tree(mesh, gparams, dsv4_grouped_param_specs(gparams))
    if gstate is not None:
        gstate = place_tree(
            mesh, gstate,
            {"segments": [
                {k: P() for k in seg} for seg in gstate["segments"]
            ]},
        )
    return gparams, gstate


def validate_dsv4_mp8(cfg, world: int = 8) -> None:
    """The reference's fixed-world-8 shardability constraints
    (deepseek-v4/src/config.rs TensorParallelConfig)."""
    for name, v in (
        ("num_attention_heads", cfg.num_attention_heads),
        ("o_groups", cfg.o_groups),
        ("n_routed_experts", cfg.n_routed_experts),
        ("index_n_heads", cfg.index_n_heads),
        ("vocab_size", cfg.vocab_size),
    ):
        if v % world:
            raise ValueError(f"mp8 world={world} must divide {name}={v}")
