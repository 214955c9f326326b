"""Qwen3.5 hybrid (linear GDN + full attention) — TPU-native forward.

Capability parity with the reference Qwen3.5-4B engine crate
(pegainfer-qwen35-4b: config src/config.rs:43-71, GDR ops src/recurrent.rs,
prefill src/prefill.rs, slot system src/batch_decode_graph.rs), re-designed
for XLA; numerics oracle is HF Qwen3NextForCausalLM (same architecture
family — layer_types of (p-1) linear_attention + 1 full_attention per
period, Gated Delta Net with conv1d, gated attention with partial RoPE).

Layout: layers are grouped by the periodic pattern; one ``lax.scan`` over
groups traces (p-1) linear layers + 1 full layer once. Per-request state:

- ``kv``   [G, Hkv, pages, 2, ps, hd]  — paged KV (k/v-adjacent), full-attention layers only
- ``rec``  [G, p-1, S+1, Hv, dk, dv] f32 — GDN recurrent state per slot
- ``conv`` [G, p-1, S+1, K, conv_dim] f32 — conv1d window per slot

where S = max_slots; row S is the dead slot that padded batch rows write to
(the TPU answer to the reference's stable-address slot compaction).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pegainfer_tpu.models.qwen3 import _proj
from pegainfer_tpu.ops import attention as att
from pegainfer_tpu.ops import gdn
from pegainfer_tpu.ops.norm import rms_norm_zero_centered as rms_norm
from pegainfer_tpu.ops.rope import apply_rope, rope_cos_sin, rope_inv_freq


@dataclass(frozen=True)
class Qwen35Config:
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    vocab_size: int
    rms_norm_eps: float
    rope_theta: float
    partial_rotary_factor: float
    layer_types: tuple
    linear_num_key_heads: int
    linear_num_value_heads: int
    linear_key_head_dim: int
    linear_value_head_dim: int
    linear_conv_kernel_dim: int
    tie_word_embeddings: bool
    eos_token_id: int = 151645
    stop_token_ids: tuple = ()
    max_position_embeddings: int = 262144

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def key_dim(self) -> int:
        return self.linear_num_key_heads * self.linear_key_head_dim

    @property
    def value_dim(self) -> int:
        return self.linear_num_value_heads * self.linear_value_head_dim

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim

    @property
    def period(self) -> int:
        """Length of the periodic layer pattern ((p-1) linear + 1 full)."""
        p = self.layer_types.index("full_attention") + 1
        expected = ("linear_attention",) * (p - 1) + ("full_attention",)
        if self.layer_types != expected * (len(self.layer_types) // p):
            raise ValueError(f"layer pattern not periodic: {self.layer_types}")
        return p

    @property
    def num_groups(self) -> int:
        return self.num_hidden_layers // self.period

    @staticmethod
    def from_hf(cfg: Any) -> "Qwen35Config":
        eos = cfg.eos_token_id
        if isinstance(eos, (list, tuple)):
            stop, eos = tuple(eos), eos[0]
        else:
            stop = (eos,) if eos is not None else ()
        return Qwen35Config(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            num_key_value_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            vocab_size=cfg.vocab_size,
            rms_norm_eps=cfg.rms_norm_eps,
            rope_theta=cfg.rope_theta,
            partial_rotary_factor=getattr(cfg, "partial_rotary_factor", 0.25),
            layer_types=tuple(cfg.layer_types),
            linear_num_key_heads=cfg.linear_num_key_heads,
            linear_num_value_heads=cfg.linear_num_value_heads,
            linear_key_head_dim=cfg.linear_key_head_dim,
            linear_value_head_dim=cfg.linear_value_head_dim,
            linear_conv_kernel_dim=cfg.linear_conv_kernel_dim,
            tie_word_embeddings=cfg.tie_word_embeddings,
            eos_token_id=eos,
            stop_token_ids=stop,
            max_position_embeddings=getattr(cfg, "max_position_embeddings", 262144),
        )

    @staticmethod
    def from_model_path(model_path: str) -> "Qwen35Config":
        """Handles both flat configs and the Qwen3.5 text_config nesting
        (reference: qwen35-4b/src/config.rs:73-110)."""
        with open(os.path.join(model_path, "config.json")) as f:
            c = json.load(f)
        t = c.get("text_config", c)
        rope = t.get("rope_parameters", {})
        theta = rope.get("rope_theta", t.get("rope_theta", 1e7))
        prf = rope.get("partial_rotary_factor", t.get("partial_rotary_factor", 0.25))
        eos = t.get("eos_token_id", c.get("eos_token_id"))
        stop = tuple(eos) if isinstance(eos, list) else ((eos,) if eos else ())
        gen_path = os.path.join(model_path, "generation_config.json")
        if os.path.exists(gen_path):
            with open(gen_path) as f:
                g = json.load(f).get("eos_token_id", None)
            if g is not None:
                stop = tuple(g) if isinstance(g, list) else (g,)
        return Qwen35Config(
            hidden_size=t["hidden_size"],
            intermediate_size=t["intermediate_size"],
            num_hidden_layers=t["num_hidden_layers"],
            num_attention_heads=t["num_attention_heads"],
            num_key_value_heads=t["num_key_value_heads"],
            head_dim=t["head_dim"],
            vocab_size=t["vocab_size"],
            rms_norm_eps=t["rms_norm_eps"],
            rope_theta=theta,
            partial_rotary_factor=prf,
            layer_types=tuple(t["layer_types"]),
            linear_num_key_heads=t["linear_num_key_heads"],
            linear_num_value_heads=t["linear_num_value_heads"],
            linear_key_head_dim=t["linear_key_head_dim"],
            linear_value_head_dim=t["linear_value_head_dim"],
            linear_conv_kernel_dim=t["linear_conv_kernel_dim"],
            tie_word_embeddings=t.get("tie_word_embeddings", False),
            eos_token_id=stop[0] if stop else None,
            stop_token_ids=stop,
            max_position_embeddings=t.get("max_position_embeddings", 262144),
        )


# ── Params ───────────────────────────────────────────────────────────────


def _split_qkvz(cfg: Qwen35Config, w: np.ndarray):
    """HF in_proj_qkvz weight [Hk*(2dk+2R*dv), D] → Wq, Wk, Wv, Wz in
    [D, out] layout (pure row reorder — numerically identical)."""
    Hk, dk = cfg.linear_num_key_heads, cfg.linear_key_head_dim
    Hv, dv = cfg.linear_num_value_heads, cfg.linear_value_head_dim
    R = Hv // Hk
    D = w.shape[1]
    wh = np.asarray(w).reshape(Hk, 2 * dk + 2 * R * dv, D)
    wq = wh[:, :dk].reshape(Hk * dk, D)
    wk = wh[:, dk:2 * dk].reshape(Hk * dk, D)
    wv = wh[:, 2 * dk:2 * dk + R * dv].reshape(Hv * dv, D)
    wz = wh[:, 2 * dk + R * dv:].reshape(Hv * dv, D)
    return wq.T, wk.T, wv.T, wz.T


def _split_ba(cfg: Qwen35Config, w: np.ndarray):
    """HF in_proj_ba weight [Hk*2R, D] → Wb, Wa in [D, Hv]."""
    Hk = cfg.linear_num_key_heads
    R = cfg.linear_num_value_heads // Hk
    D = w.shape[1]
    wh = np.asarray(w).reshape(Hk, 2 * R, D)
    wb = wh[:, :R].reshape(Hk * R, D)
    wa = wh[:, R:].reshape(Hk * R, D)
    return wb.T, wa.T


def _split_q_gate(cfg: Qwen35Config, w: np.ndarray):
    """HF full-attn q_proj [Hq*2hd, D] → Wq, Wgate in [D, Hq*hd]."""
    Hq, hd = cfg.num_attention_heads, cfg.head_dim
    D = w.shape[1]
    wh = np.asarray(w).reshape(Hq, 2 * hd, D)
    wq = wh[:, :hd].reshape(Hq * hd, D)
    wg = wh[:, hd:].reshape(Hq * hd, D)
    return wq.T, wg.T


def params_from_state_dict(cfg: Qwen35Config, sd: Dict[str, Any], dtype=jnp.bfloat16):
    """Build the grouped pytree from an HF Qwen3Next-named state dict."""
    p, G = cfg.period, cfg.num_groups

    def get(name):
        return np.asarray(sd[name])

    def lin_layer(i):
        pre = f"model.layers.{i}"
        wq, wk, wv, wz = _split_qkvz(cfg, get(f"{pre}.linear_attn.in_proj_qkvz.weight"))
        wb, wa = _split_ba(cfg, get(f"{pre}.linear_attn.in_proj_ba.weight"))
        return {
            "input_ln": get(f"{pre}.input_layernorm.weight"),
            "wq": wq, "wk": wk, "wv": wv, "wz": wz, "wb": wb, "wa": wa,
            "conv_w": get(f"{pre}.linear_attn.conv1d.weight")[:, 0, :],  # [C, K]
            "dt_bias": get(f"{pre}.linear_attn.dt_bias"),
            "A_log": get(f"{pre}.linear_attn.A_log"),
            "norm_w": get(f"{pre}.linear_attn.norm.weight"),
            "out_proj": get(f"{pre}.linear_attn.out_proj.weight").T,
            "post_ln": get(f"{pre}.post_attention_layernorm.weight"),
            "mlp_gate_up": np.concatenate(
                [get(f"{pre}.mlp.gate_proj.weight").T, get(f"{pre}.mlp.up_proj.weight").T],
                axis=1,
            ),
            "mlp_down": get(f"{pre}.mlp.down_proj.weight").T,
        }

    def full_layer(i):
        pre = f"model.layers.{i}"
        wq, wg = _split_q_gate(cfg, get(f"{pre}.self_attn.q_proj.weight"))
        return {
            "input_ln": get(f"{pre}.input_layernorm.weight"),
            "wq": wq, "wgate": wg,
            "wk": get(f"{pre}.self_attn.k_proj.weight").T,
            "wv": get(f"{pre}.self_attn.v_proj.weight").T,
            "q_norm": get(f"{pre}.self_attn.q_norm.weight"),
            "k_norm": get(f"{pre}.self_attn.k_norm.weight"),
            "wo": get(f"{pre}.self_attn.o_proj.weight").T,
            "post_ln": get(f"{pre}.post_attention_layernorm.weight"),
            "mlp_gate_up": np.concatenate(
                [get(f"{pre}.mlp.gate_proj.weight").T, get(f"{pre}.mlp.up_proj.weight").T],
                axis=1,
            ),
            "mlp_down": get(f"{pre}.mlp.down_proj.weight").T,
        }

    def stack_tree(dicts):
        return {k: np.stack([d[k] for d in dicts]) for k in dicts[0]}

    lin_groups = []
    full_groups = []
    for g in range(G):
        base = g * p
        lin_groups.append(stack_tree([lin_layer(base + j) for j in range(p - 1)]))
        full_groups.append(full_layer(base + p - 1))

    lin = stack_tree(lin_groups)  # leaves [G, p-1, ...]
    full = stack_tree(full_groups)  # leaves [G, ...]

    embed = get("model.embed_tokens.weight")
    lm_head = embed.T if cfg.tie_word_embeddings else get("lm_head.weight").T

    def cast(x, keep_f32=False):
        return jnp.asarray(x, jnp.float32 if keep_f32 else dtype)

    F32_KEYS = {"dt_bias", "A_log", "conv_w"}
    params = {
        "embed": cast(embed),
        "lin": {k: cast(v, k in F32_KEYS) for k, v in lin.items()},
        "full": {k: cast(v) for k, v in full.items()},
        "final_ln": cast(get("model.norm.weight")),
        "lm_head": cast(lm_head),
    }
    return params


def bench_config() -> "Qwen35Config":
    """Qwen3.5-4B-class shapes (period-4 hybrid: 3 linear + 1 full per
    group × 8 groups = 32 layers; hd256 GQA8 full attention — reference
    crate: pegainfer-qwen35-4b/src/config.rs:43-71)."""
    return Qwen35Config(
        hidden_size=2048, intermediate_size=6144, num_hidden_layers=32,
        num_attention_heads=16, num_key_value_heads=2, head_dim=256,
        vocab_size=151936, rms_norm_eps=1e-6, rope_theta=1e7,
        partial_rotary_factor=0.25,
        layer_types=("linear_attention",) * 3 + ("full_attention",),
        linear_num_key_heads=16, linear_num_value_heads=32,
        linear_key_head_dim=128, linear_value_head_dim=128,
        linear_conv_kernel_dim=4, tie_word_embeddings=True,
    )


def init_bench_params(cfg: Qwen35Config, dtype=jnp.bfloat16, fill: float = 0.01):
    """Constant-filled params at real shapes, allocated device-side (see
    qwen3.init_bench_params — benchmark timing is data-independent)."""
    G, pl_ = cfg.num_groups, cfg.period - 1
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Hq, hd = cfg.num_attention_heads, cfg.head_dim
    Hkv = cfg.num_key_value_heads
    Hv = cfg.linear_num_value_heads
    kd, vd, K = cfg.key_dim, cfg.value_dim, cfg.linear_conv_kernel_dim

    def w(*shape):
        return jnp.full(shape, fill, dtype=dtype)

    def ones(*shape, dt=dtype):
        return jnp.ones(shape, dtype=dt)

    lin = {
        "input_ln": ones(G, pl_, D),
        "wq": w(G, pl_, D, kd), "wk": w(G, pl_, D, kd),
        "wv": w(G, pl_, D, vd), "wz": w(G, pl_, D, vd),
        "wb": w(G, pl_, D, Hv), "wa": w(G, pl_, D, Hv),
        "conv_w": jnp.full((G, pl_, cfg.conv_dim, K), fill, jnp.float32),
        "dt_bias": jnp.zeros((G, pl_, Hv), jnp.float32),
        "A_log": jnp.zeros((G, pl_, Hv), jnp.float32),
        "norm_w": ones(G, pl_, cfg.linear_value_head_dim),
        "out_proj": w(G, pl_, vd, D),
        "post_ln": ones(G, pl_, D),
        "mlp_gate_up": w(G, pl_, D, 2 * I),
        "mlp_down": w(G, pl_, I, D),
    }
    full = {
        "input_ln": ones(G, D),
        "wq": w(G, D, Hq * hd), "wgate": w(G, D, Hq * hd),
        "wk": w(G, D, Hkv * hd), "wv": w(G, D, Hkv * hd),
        "q_norm": ones(G, hd), "k_norm": ones(G, hd),
        "wo": w(G, Hq * hd, D),
        "post_ln": ones(G, D),
        "mlp_gate_up": w(G, D, 2 * I),
        "mlp_down": w(G, I, D),
    }
    return {
        "embed": w(V, D),
        "lin": lin,
        "full": full,
        "final_ln": ones(D),
        "lm_head": w(D, V),
    }


def init_random_params(cfg: Qwen35Config, seed: int = 0,
                       dtype=jnp.bfloat16, scale: float = 0.02):
    """Random params in the serving layout (same leaves as
    init_bench_params). Constant-filled weights make greedy argmax
    degenerate (every logit equal → token 0), which lets a broken sharded
    forward pass a token-count check — correctness dryruns/tests need
    non-degenerate logits."""
    bench = init_bench_params(cfg, dtype=dtype)
    rng = np.random.default_rng(seed)

    def rand_like(path, leaf):
        name = path[-1]
        if name.endswith("_ln") or name.startswith(("q_norm", "k_norm")) \
                or name in ("norm_w", "final_ln"):
            return leaf  # keep norms at 1
        arr = rng.standard_normal(leaf.shape).astype(np.float32) * scale
        return jnp.asarray(arr, leaf.dtype)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return rand_like(path, tree)

    return walk(bench)


def fuse_params(params):
    """Optional fused-projection layout (one GEMM per site, mirroring the
    HF checkpoint's in_proj_qkvz / q_proj). MEASURED NEUTRAL-TO-WORSE on
    v5e (TPOT 16.46 vs 15.92 ms split) — XLA already schedules the split
    GEMVs well; kept as a tested alternative layout, not wired by default.
    TP must keep the split layout (sharding the fused out axis would cut
    across segment boundaries)."""
    lin = dict(params["lin"])
    full = dict(params["full"])
    lin["qkvzba"] = jnp.concatenate(
        [lin.pop(k) for k in ("wq", "wk", "wv", "wz", "wb", "wa")], axis=-1
    )
    full["qgkv"] = jnp.concatenate(
        [full.pop(k) for k in ("wq", "wgate", "wk", "wv")], axis=-1
    )
    return {**params, "lin": lin, "full": full}


def quantize_params_int8(params):
    """Weight-only int8 (per output channel) for the streaming-bound
    matrices; norms/embed/conv/gates stay in their checkpoint dtype — see
    qwen3.quantize_params_int8. CONSUMES ``params`` (buffers donated).
    Handles both the split and fused (fuse_params) layouts."""
    from pegainfer_tpu.models.qwen3 import _qs_int8_donating

    big_lin = ("wq", "wk", "wv", "wz", "qkvzba", "out_proj",
               "mlp_gate_up", "mlp_down")
    big_full = ("wq", "wgate", "wk", "wv", "qgkv", "wo",
                "mlp_gate_up", "mlp_down")
    lin = {k: (_qs_int8_donating(v) if k in big_lin else v)
           for k, v in params["lin"].items()}
    full = {k: (_qs_int8_donating(v) if k in big_full else v)
            for k, v in params["full"].items()}
    return {
        "embed": params["embed"],
        "lin": lin,
        "full": full,
        "final_ln": params["final_ln"],
        "lm_head": _qs_int8_donating(params["lm_head"]),
    }


# ── State ────────────────────────────────────────────────────────────────


def make_state(cfg: Qwen35Config, num_pages: int, page_size: int,
               max_slots: int = 64, kv_dtype=jnp.bfloat16):
    G, pl_ = cfg.num_groups, cfg.period - 1
    return {
        "kv": jnp.zeros(
            # k/v-adjacent paged pool (one DMA per page fetches k+v — see
            # qwen3.make_kv_pages)
            (G, cfg.num_key_value_heads, num_pages, 2, page_size, cfg.head_dim),
            dtype=kv_dtype,
        ),
        "rec": jnp.zeros(
            (G, pl_, max_slots + 1, cfg.linear_num_value_heads,
             cfg.linear_key_head_dim, cfg.linear_value_head_dim),
            dtype=jnp.float32,
        ),
        "conv": jnp.zeros(
            (G, pl_, max_slots + 1, cfg.linear_conv_kernel_dim, cfg.conv_dim),
            dtype=jnp.float32,
        ),
    }


def kv_bytes_per_page(cfg: Qwen35Config, page_size: int, dtype=jnp.bfloat16) -> int:
    return (
        cfg.num_groups * 2 * page_size * cfg.num_key_value_heads
        * cfg.head_dim * jnp.dtype(dtype).itemsize
    )


# ── Shared pieces ────────────────────────────────────────────────────────


def _mlp(lw, x):
    gu = _proj(lw, "mlp_gate_up", x)
    gate, up = jnp.split(gu, 2, axis=-1)
    return _proj(lw, "mlp_down", jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up)


def _gdn_project(cfg: Qwen35Config, lw, h):
    """h: [N, D] → conv input [N, conv_dim] plus z, g, beta (pre-conv).

    Two layouts: split (wq/wk/wv/wz/wb/wa — TP-shardable) or fused
    ("qkvzba", one GEMM — the single-chip decode layout; a bs=1 GDN layer
    of six serialized projections measured ~250 GB/s vs ~370+ fused,
    scripts/kernel_report.py)."""
    kd, vd = cfg.key_dim, cfg.value_dim
    Hv, dv = cfg.linear_num_value_heads, cfg.linear_value_head_dim
    if "qkvzba" in lw:
        y = _proj(lw, "qkvzba", h)  # [N, 2kd + 2vd + 2Hv]
        q = y[:, :kd]
        k = y[:, kd:2 * kd]
        v = y[:, 2 * kd:2 * kd + vd]
        z = y[:, 2 * kd + vd:2 * kd + 2 * vd].reshape(-1, Hv, dv)
        b = y[:, 2 * kd + 2 * vd:2 * kd + 2 * vd + Hv]
        a = y[:, 2 * kd + 2 * vd + Hv:]
    else:
        q = _proj(lw, "wq", h)  # [N, Hk*dk]
        k = _proj(lw, "wk", h)
        v = _proj(lw, "wv", h)  # [N, Hv*dv]
        z = _proj(lw, "wz", h).reshape(-1, Hv, dv)
        b = h @ lw["wb"]  # [N, Hv]
        a = h @ lw["wa"]
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(lw["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + lw["dt_bias"].astype(jnp.float32)
    )
    mixed = jnp.concatenate([q, k, v], axis=-1)  # [N, conv_dim]
    return mixed, z, g, beta


def _gdn_split_heads(cfg: Qwen35Config, mixed):
    """Post-conv [N, conv_dim] → q, k expanded to Hv heads; v [N, Hv, dv]."""
    Hk, dk = cfg.linear_num_key_heads, cfg.linear_key_head_dim
    Hv, dv = cfg.linear_num_value_heads, cfg.linear_value_head_dim
    R = Hv // Hk
    q = mixed[:, :cfg.key_dim].reshape(-1, Hk, dk)
    k = mixed[:, cfg.key_dim:2 * cfg.key_dim].reshape(-1, Hk, dk)
    v = mixed[:, 2 * cfg.key_dim:].reshape(-1, Hv, dv)
    if R > 1:
        q = jnp.repeat(q, R, axis=1)
        k = jnp.repeat(k, R, axis=1)
    return q, k, v


def _gated_norm(cfg: Qwen35Config, norm_w, out, z):
    """RMSNormGated: per-v-head norm, weight, then * silu(z) (HF semantics)."""
    of = out.astype(jnp.float32)
    var = jnp.mean(of * of, axis=-1, keepdims=True)
    normed = (of * lax.rsqrt(var + cfg.rms_norm_eps)).astype(z.dtype) * norm_w
    return normed.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))


def _full_qkv(cfg: Qwen35Config, fw, h, cos, sin):
    """Full-attention projections with qk-norm + partial RoPE + gate.
    Split (wq/wgate/wk/wv) or fused ("qgkv") layouts — see _gdn_project."""
    N = h.shape[0]
    hd = cfg.head_dim
    if "qgkv" in fw:
        qd = cfg.num_attention_heads * hd
        kvd = cfg.num_key_value_heads * hd
        y = _proj(fw, "qgkv", h)  # [N, 2qd + 2kvd]
        q = y[:, :qd].reshape(N, cfg.num_attention_heads, hd)
        gate = y[:, qd:2 * qd]
        k = y[:, 2 * qd:2 * qd + kvd].reshape(N, cfg.num_key_value_heads, hd)
        v = y[:, 2 * qd + kvd:].reshape(N, cfg.num_key_value_heads, hd)
    else:
        q = _proj(fw, "wq", h).reshape(N, cfg.num_attention_heads, hd)
        gate = _proj(fw, "wgate", h)  # [N, Hq*hd]
        k = _proj(fw, "wk", h).reshape(N, cfg.num_key_value_heads, hd)
        v = _proj(fw, "wv", h).reshape(N, cfg.num_key_value_heads, hd)
    q = rms_norm(q, fw["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, fw["k_norm"], cfg.rms_norm_eps)
    rd = cfg.rotary_dim
    q_rot = apply_rope(q[..., :rd], cos, sin)
    k_rot = apply_rope(k[..., :rd], cos, sin)
    q = jnp.concatenate([q_rot, q[..., rd:]], axis=-1)
    k = jnp.concatenate([k_rot, k[..., rd:]], axis=-1)
    return q, k, v, gate


# ── Prefill ──────────────────────────────────────────────────────────────


def prefill(cfg: Qwen35Config, params, state, tokens, seq_len, page_table, slot,
            return_all_logits: bool = False, gdn_chunk_size: int = 16,
            use_pallas: bool = False, mode: str = None):
    # gdn_chunk_size default 16 (was 64): the chunkwise pipeline's
    # in-chunk triangular-solve work is O(C^2·T) and dominates on this
    # chip — measured prefill_flat T=1024 at bench geometry: C=8/16/32/
    # 64/128 = 96.3/92.3/105.5/123.0/150.0 ms (docs/PERF.md round 5,
    # VERDICT r4 #4 — the Qwen3.5 TTFT residual).
    """Prefill one prompt; write KV pages + slot recurrent/conv state.

    tokens: [T] int32 padded (T a multiple of the effective GDN chunk —
    clamped to T for short prompts); slot: scalar int32.
    Returns (state, last_logits [V] f32, all_logits|None).

    ``mode``: "flat" | "grouped" — which layout runs union params (flat =
    per-layer union scan; grouped = the _group_xs reshape view). The env
    PEGAINFER_Q35_PREFILL is only the default for direct callers and is
    captured at TRACE time — engines resolve it once in make_runtime and
    pass it explicitly (ADVICE r3: a post-jit env change is silent).
    """
    if mode is None:
        mode = os.environ.get("PEGAINFER_Q35_PREFILL", "flat")
    if "union" in params and mode == "flat":
        return prefill_flat(cfg, params, state, tokens, seq_len, page_table,
                            slot, return_all_logits=return_all_logits,
                            gdn_chunk_size=gdn_chunk_size,
                            use_pallas=use_pallas)
    wxs, lw_at, fw_of = _group_xs(cfg, params)
    T = tokens.shape[0]
    x = params["embed"][tokens]
    positions = jnp.arange(T, dtype=jnp.int32)
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    valid = (positions < seq_len)[:, None]

    # State is write-only during prefill (attention reads in-flight k/v,
    # GDN starts from zero state) — keep it out of the scan; one dus chain
    # per array after (in place on donated buffers, docs/PERF.md).
    def group(x, inputs):
        gi, wg = inputs
        S_new, conv_new = [], []

        # (p-1) linear layers
        for j in range(cfg.period - 1):
            lw = lw_at(wg, j)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)
            y, conv_state = gdn.causal_conv1d(mixed, lw["conv_w"], seq_len)
            q, k, v = _gdn_split_heads(cfg, y)
            g = jnp.where(valid, g, 0.0)
            beta = jnp.where(valid, beta, 0.0)
            S0 = jnp.zeros(
                (cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                 cfg.linear_value_head_dim), jnp.float32,
            )
            out, S = gdn.gdn_chunk(q, k, v, g, beta, S0,
                                   chunk=min(gdn_chunk_size, T))
            S_new.append(S)
            conv_new.append(conv_state)
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x = x + _proj(lw, "out_proj", out.reshape(T, -1))
            h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
            x = x + _mlp(lw, h)

        # full-attention layer
        fw = fw_of(wg)
        h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
        q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
        if use_pallas and T % 128 == 0:
            from pegainfer_tpu.ops.pallas import flash_prefill

            o = flash_prefill(q, k, v, seq_len, scale)
        else:
            o = att.prefill_attention(q, k, v, seq_len, scale)
        o = o.reshape(T, -1) * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        x = x + _proj(fw, "wo", o)
        h = rms_norm(x, fw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(fw, h)
        return x, (k, v, jnp.stack(S_new), jnp.stack(conv_new))

    G = cfg.num_groups
    x, (k_all, v_all, S_all, conv_all) = lax.scan(
        group, x, (jnp.arange(G, dtype=jnp.int32), wxs)
    )
    from pegainfer_tpu.models.qwen3 import _write_pages

    kv = _write_pages(state["kv"], k_all, v_all, page_table)
    # one-slot rectangular updates: [G, pl_, 1, ...] at (0, 0, slot, ...)
    rec = lax.dynamic_update_slice(
        state["rec"], S_all[:, :, None], (0, 0, slot, 0, 0, 0))
    conv = lax.dynamic_update_slice(
        state["conv"], conv_all[:, :, None], (0, 0, slot, 0, 0))
    state = {"kv": kv, "rec": rec, "conv": conv}
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if return_all_logits:
        all_logits = _proj(params, "lm_head", x).astype(jnp.float32)
        return state, all_logits[seq_len - 1], all_logits
    last = _proj(params, "lm_head", x[seq_len - 1][None, :])[0].astype(jnp.float32)
    return state, last, None


# ── Chunked prefill continuation ─────────────────────────────────────────


def make_chunk_pend(cfg: Qwen35Config, n_pages: int, page_size: int,
                    max_slots: int, kv_dtype=jnp.bfloat16):
    """Empty pending record for write-ahead chunked prefill: the previous
    chunk's kv pages + the slot's GDN/conv state after that chunk."""
    G, pl_ = cfg.num_groups, cfg.period - 1
    return {
        "rows": jnp.zeros(
            (n_pages, G, cfg.num_key_value_heads, 2, page_size, cfg.head_dim),
            kv_dtype),
        "pages": jnp.zeros((n_pages,), jnp.int32),
        "rec": jnp.zeros((G, pl_, cfg.linear_num_value_heads,
                          cfg.linear_key_head_dim, cfg.linear_value_head_dim),
                         jnp.float32),
        "conv": jnp.zeros((G, pl_, cfg.linear_conv_kernel_dim, cfg.conv_dim),
                          jnp.float32),
        "slot": jnp.int32(max_slots),  # dead slot
    }


def flush_chunk_pend(state, cpend):
    """Land a chunk-pend into (kv, rec, conv) — dus chains, in place."""
    rows, pages = cpend["rows"], cpend["pages"]
    nP, G, Hkv, _, ps, hd = rows.shape
    kv = state["kv"]
    rows = rows.astype(kv.dtype)
    for p in range(nP):
        kv = lax.dynamic_update_slice(
            kv, rows[p].reshape(G, Hkv, 1, 2, ps, hd), (0, 0, pages[p], 0, 0, 0))
    rec = lax.dynamic_update_slice(
        state["rec"], cpend["rec"][:, :, None], (0, 0, cpend["slot"], 0, 0, 0))
    conv = lax.dynamic_update_slice(
        state["conv"], cpend["conv"][:, :, None], (0, 0, cpend["slot"], 0, 0))
    return {"kv": kv, "rec": rec, "conv": conv}


def prefill_chunk_wa(cfg: Qwen35Config, params, state, cpend, tokens,
                     start_pos, valid, page_table, slot,
                     gdn_chunk_size: int = 16, use_pallas: bool = False,
                     return_all_logits: bool = False, mode: str = None):
    """WRITE-AHEAD prefill continuation (see qwen3.prefill_chunk_wa): state
    written once at the start (landing the previous chunk's cpend), then
    only read; attention splices the chunk's in-flight k/v over the gathered
    past; this chunk's pages + GDN/conv state return as the new cpend.
    tokens: [Tc] (Tc % page_size == 0, start_pos % page_size == 0).
    Returns (state, cpend', last_logits [V] f32)."""
    if mode is None:
        mode = os.environ.get("PEGAINFER_Q35_PREFILL", "flat")
    if "union" in params and mode == "flat":
        return prefill_chunk_wa_flat(
            cfg, params, state, cpend, tokens, start_pos, valid, page_table,
            slot, gdn_chunk_size=gdn_chunk_size, use_pallas=use_pallas,
            return_all_logits=return_all_logits)
    wxs, lw_at, fw_of = _group_xs(cfg, params)
    Tc = tokens.shape[0]
    page_size = state["kv"].shape[4]
    chunk_sz = min(gdn_chunk_size, Tc)
    state = flush_chunk_pend(state, cpend)
    x = params["embed"][tokens]
    positions = start_pos + jnp.arange(Tc, dtype=jnp.int32)
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    local = jnp.arange(Tc, dtype=jnp.int32)
    valid_mask = (local < valid)[:, None]
    first_page = start_pos // page_size
    P = page_table.shape[0]
    S_len = P * page_size
    kv0, rec0, conv0 = state["kv"], state["rec"], state["conv"]

    def group(x, inputs):
        gi, wg = inputs
        S_new, conv_new = [], []

        for j in range(cfg.period - 1):
            lw = lw_at(wg, j)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)
            # first chunk must not see a recycled slot's stale state
            fresh = (start_pos > 0)
            prev_conv = jnp.where(fresh, conv0[gi, j, slot], 0.0)
            y, conv_state = gdn.causal_conv1d_cont(
                mixed, lw["conv_w"], prev_conv, valid
            )
            conv_new.append(conv_state)
            q, k, v = _gdn_split_heads(cfg, y)
            g = jnp.where(valid_mask, g, 0.0)
            beta = jnp.where(valid_mask, beta, 0.0)
            S0 = jnp.where(fresh, rec0[gi, j, slot], 0.0)
            out, S = gdn.gdn_chunk(q, k, v, g, beta, S0, chunk=chunk_sz)
            S_new.append(S)
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x = x + _proj(lw, "out_proj", out.reshape(Tc, -1))
            h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
            x = x + _mlp(lw, h)

        fw = fw_of(wg)
        h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
        q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
        hd = q.shape[2]
        # one gather fetches k AND v (adjacent in the page); advanced indices
        # (gi, page_table) separated by the Hkv slice → [P, Hkv, 2, ps, hd]
        kv_seq = kv0[gi, :, page_table]
        k_seq = kv_seq[:, :, 0].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
        v_seq = kv_seq[:, :, 1].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
        k_seq = lax.dynamic_update_slice(k_seq, k.astype(k_seq.dtype), (start_pos, 0, 0))
        v_seq = lax.dynamic_update_slice(v_seq, v.astype(v_seq.dtype), (start_pos, 0, 0))
        if use_pallas:
            from pegainfer_tpu.ops.pallas import flash_attention

            o = flash_attention(q, k_seq, v_seq, start_pos + valid, start_pos, scale)
        else:
            o = att.chunk_attention_seq(q, k_seq, v_seq, start_pos, scale)
        o = o.reshape(Tc, -1) * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        x = x + _proj(fw, "wo", o)
        h = rms_norm(x, fw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(fw, h)
        return x, (k, v, jnp.stack(S_new), jnp.stack(conv_new))

    G = cfg.num_groups
    x, (k_all, v_all, S_all, conv_all) = lax.scan(
        group, x, (jnp.arange(G, dtype=jnp.int32), wxs)
    )
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    nPc = Tc // page_size
    rows = (
        jnp.stack([k_all, v_all])
        .reshape(2, G, nPc, page_size, Hkv, hd)
        .transpose(2, 1, 4, 0, 3, 5)
        .astype(kv0.dtype)
    )
    chunk_table = lax.dynamic_slice_in_dim(page_table, first_page, nPc)
    cpend = {"rows": rows, "pages": chunk_table, "rec": S_all,
             "conv": conv_all, "slot": slot}
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if return_all_logits:
        all_logits = _proj(params, "lm_head", x).astype(jnp.float32)
        return state, cpend, all_logits[valid - 1], all_logits
    last = _proj(params, "lm_head", x[valid - 1][None, :])[0].astype(jnp.float32)
    return state, cpend, last


def prefill_chunk(cfg: Qwen35Config, params, state, tokens, start_pos, valid,
                  page_table, slot, gdn_chunk_size: int = 16,
                  use_pallas: bool = False):
    """One chunk of a prompt (self-contained form: state complete on return;
    the engine stepper uses ``prefill_chunk_wa`` + a final flush).
    tokens: [Tc] (Tc % page_size == 0, start_pos % page_size == 0).
    Returns (state, last_logits [V] f32)."""
    page_size = state["kv"].shape[4]
    cpend = make_chunk_pend(cfg, tokens.shape[0] // page_size, page_size,
                            state["rec"].shape[2] - 1, state["kv"].dtype)
    state, cpend, last = prefill_chunk_wa(
        cfg, params, state, cpend, tokens, start_pos, valid, page_table, slot,
        gdn_chunk_size=gdn_chunk_size, use_pallas=use_pallas,
    )
    state = flush_chunk_pend(state, cpend)
    return state, last


# ── Flat-union prefill ───────────────────────────────────────────────────
#
# Same structure as decode_wa_flat: ONE scan over all layers with the
# per-layer union slice as the xs — the only form XLA's scan prefetch
# pipelines (multi-layer xs slices, grouped OR union, measured 244-250 GB/s
# vs 599-712 flat; docs/PERF.md round-3 union section). For prefill the
# win is overlap: each layer's ~230 MB weight stream hides under the
# previous layer's token-parallel GEMMs instead of serializing with them.


def prefill_flat(cfg: Qwen35Config, params, state, tokens, seq_len,
                 page_table, slot, return_all_logits: bool = False,
                 gdn_chunk_size: int = 16, use_pallas: bool = False):
    """Single-shot prefill over the flat union layout.

    Semantics identical to ``prefill`` on grouped params (pinned by
    tests/test_qwen35_flat.py); state handling unchanged — write-only,
    landed by one dus chain per array after the scan.

    HBM note (ADVICE r3): the scan's kv_row ys is emitted by EVERY layer
    (linear layers emit zeros) because scan ys must be shape-uniform, so
    the buffer is [Lt, T, Hkv, 2, hd] — period× the grouped path's
    [G, T, ...]. At 4B scale that is ~65 KB/token (~670 MB for a 10k
    single-shot prefill); the ENGINE path is unaffected in practice
    because chunked prefill caps T at the 1-2k chunk (~65-130 MB
    transient). If single-shot long-prompt prefill ever becomes a mode,
    split the kv emission into a second scan over full layers only."""
    p, pl_ = cfg.period, cfg.period - 1
    G, Lt = cfg.num_groups, cfg.num_hidden_layers
    T = tokens.shape[0]
    x = params["embed"][tokens]
    positions = jnp.arange(T, dtype=jnp.int32)
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    valid = (positions < seq_len)[:, None]
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    Hv, dk, dv = (cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                  cfg.linear_value_head_dim)
    K, C = cfg.linear_conv_kernel_dim, cfg.conv_dim

    def layer(x, xs):
        li, u = xs
        is_full = (li % p) == pl_

        def lin_fn(x):
            lw = _union_lw(cfg, u)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)
            y, conv_state = gdn.causal_conv1d(mixed, lw["conv_w"], seq_len)
            q, k, v = _gdn_split_heads(cfg, y)
            g = jnp.where(valid, g, 0.0)
            beta = jnp.where(valid, beta, 0.0)
            S0 = jnp.zeros((Hv, dk, dv), jnp.float32)
            out, S = gdn.gdn_chunk(q, k, v, g, beta, S0,
                                   chunk=min(gdn_chunk_size, T))
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x2 = x + _proj(lw, "out_proj", out.reshape(T, -1))
            kv_row = jnp.zeros((T, Hkv, 2, hd), x.dtype)
            return x2, kv_row, S, conv_state

        def full_fn(x):
            fw = _union_fw(cfg, u)
            h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
            q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
            if use_pallas and T % 128 == 0:
                from pegainfer_tpu.ops.pallas import flash_prefill

                o = flash_prefill(q, k, v, seq_len, scale)
            else:
                o = att.prefill_attention(q, k, v, seq_len, scale)
            o = o.reshape(T, -1) * jax.nn.sigmoid(
                gate.astype(jnp.float32)).astype(x.dtype)
            x2 = x + _proj(fw, "wo", o)
            kv_row = jnp.stack([k, v], axis=2).astype(x.dtype)
            S = jnp.zeros((Hv, dk, dv), jnp.float32)
            conv_state = jnp.zeros((K, C), jnp.float32)
            return x2, kv_row, S, conv_state

        x, kv_row, S, conv_state = lax.cond(is_full, full_fn, lin_fn, x)
        h = rms_norm(x, u["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp({"mlp_gate_up": u["gu"], "mlp_down": u["dn"]}, h)
        return x, (kv_row, S, conv_state)

    x, (kv_rows, S_flat, conv_flat) = lax.scan(
        layer, x, (jnp.arange(Lt, dtype=jnp.int32), params["union"]))

    kvr = kv_rows.reshape(G, p, T, Hkv, 2, hd)[:, p - 1]
    k_all, v_all = kvr[..., 0, :], kvr[..., 1, :]
    S_all = S_flat.reshape(G, p, Hv, dk, dv)[:, :pl_]
    conv_all = conv_flat.reshape(G, p, K, C)[:, :pl_]

    from pegainfer_tpu.models.qwen3 import _write_pages

    kv = _write_pages(state["kv"], k_all, v_all, page_table)
    rec = lax.dynamic_update_slice(
        state["rec"], S_all[:, :, None], (0, 0, slot, 0, 0, 0))
    conv = lax.dynamic_update_slice(
        state["conv"], conv_all[:, :, None], (0, 0, slot, 0, 0))
    state = {"kv": kv, "rec": rec, "conv": conv}
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if return_all_logits:
        all_logits = _proj(params, "lm_head", x).astype(jnp.float32)
        return state, all_logits[seq_len - 1], all_logits
    last = _proj(params, "lm_head", x[seq_len - 1][None, :])[0].astype(jnp.float32)
    return state, last, None


def prefill_chunk_wa_flat(cfg: Qwen35Config, params, state, cpend, tokens,
                          start_pos, valid, page_table, slot,
                          gdn_chunk_size: int = 16, use_pallas: bool = False,
                          return_all_logits: bool = False):
    """Write-ahead chunked prefill over the flat union layout (see
    ``prefill_chunk_wa`` for the protocol; structure per the section
    comment)."""
    p, pl_ = cfg.period, cfg.period - 1
    G, Lt = cfg.num_groups, cfg.num_hidden_layers
    Tc = tokens.shape[0]
    page_size = state["kv"].shape[4]
    chunk_sz = min(gdn_chunk_size, Tc)
    state = flush_chunk_pend(state, cpend)
    x = params["embed"][tokens]
    positions = start_pos + jnp.arange(Tc, dtype=jnp.int32)
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    local = jnp.arange(Tc, dtype=jnp.int32)
    valid_mask = (local < valid)[:, None]
    first_page = start_pos // page_size
    P = page_table.shape[0]
    S_len = P * page_size
    kv0, rec0, conv0 = state["kv"], state["rec"], state["conv"]
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    Hv, dk, dv = (cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                  cfg.linear_value_head_dim)
    K, C = cfg.linear_conv_kernel_dim, cfg.conv_dim

    def layer(x, xs):
        li, u = xs
        gi = li // p
        j = jnp.minimum(li % p, pl_ - 1)  # clipped: full rows never read it
        is_full = (li % p) == pl_

        def lin_fn(x):
            lw = _union_lw(cfg, u)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)
            fresh = (start_pos > 0)
            prev_conv = jnp.where(fresh, conv0[gi, j, slot], 0.0)
            y, conv_state = gdn.causal_conv1d_cont(
                mixed, lw["conv_w"], prev_conv, valid)
            q, k, v = _gdn_split_heads(cfg, y)
            g = jnp.where(valid_mask, g, 0.0)
            beta = jnp.where(valid_mask, beta, 0.0)
            S0 = jnp.where(fresh, rec0[gi, j, slot], 0.0)
            out, S = gdn.gdn_chunk(q, k, v, g, beta, S0, chunk=chunk_sz)
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x2 = x + _proj(lw, "out_proj", out.reshape(Tc, -1))
            kv_row = jnp.zeros((Tc, Hkv, 2, hd), x.dtype)
            return x2, kv_row, S, conv_state

        def full_fn(x):
            fw = _union_fw(cfg, u)
            h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
            q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
            kv_seq = kv0[gi, :, page_table]
            k_seq = kv_seq[:, :, 0].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
            v_seq = kv_seq[:, :, 1].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
            k_seq = lax.dynamic_update_slice(
                k_seq, k.astype(k_seq.dtype), (start_pos, 0, 0))
            v_seq = lax.dynamic_update_slice(
                v_seq, v.astype(v_seq.dtype), (start_pos, 0, 0))
            if use_pallas:
                from pegainfer_tpu.ops.pallas import flash_attention

                o = flash_attention(q, k_seq, v_seq, start_pos + valid,
                                    start_pos, scale)
            else:
                o = att.chunk_attention_seq(q, k_seq, v_seq, start_pos, scale)
            o = o.reshape(Tc, -1) * jax.nn.sigmoid(
                gate.astype(jnp.float32)).astype(x.dtype)
            x2 = x + _proj(fw, "wo", o)
            kv_row = jnp.stack([k, v], axis=2).astype(x.dtype)
            S = jnp.zeros((Hv, dk, dv), jnp.float32)
            conv_state = jnp.zeros((K, C), jnp.float32)
            return x2, kv_row, S, conv_state

        x, kv_row, S, conv_state = lax.cond(is_full, full_fn, lin_fn, x)
        h = rms_norm(x, u["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp({"mlp_gate_up": u["gu"], "mlp_down": u["dn"]}, h)
        return x, (kv_row, S, conv_state)

    x, (kv_rows, S_flat, conv_flat) = lax.scan(
        layer, x, (jnp.arange(Lt, dtype=jnp.int32), params["union"]))

    kvr = kv_rows.reshape(G, p, Tc, Hkv, 2, hd)[:, p - 1]
    S_all = S_flat.reshape(G, p, Hv, dk, dv)[:, :pl_]
    conv_all = conv_flat.reshape(G, p, K, C)[:, :pl_]
    nPc = Tc // page_size
    rows = (
        kvr.transpose(3, 0, 1, 2, 4)  # [2, G, Tc, Hkv, hd]
        .reshape(2, G, nPc, page_size, Hkv, hd)
        .transpose(2, 1, 4, 0, 3, 5)
        .astype(kv0.dtype)
    )
    chunk_table = lax.dynamic_slice_in_dim(page_table, first_page, nPc)
    cpend = {"rows": rows, "pages": chunk_table, "rec": S_all,
             "conv": conv_all, "slot": slot}
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if return_all_logits:
        all_logits = _proj(params, "lm_head", x).astype(jnp.float32)
        return state, cpend, all_logits[valid - 1], all_logits
    last = _proj(params, "lm_head", x[valid - 1][None, :])[0].astype(jnp.float32)
    return state, cpend, last


# ── Batched decode ───────────────────────────────────────────────────────


def make_pend(cfg: Qwen35Config, B: int, max_slots: int, kv_dtype=jnp.bfloat16):
    """Empty pending-state record for write-ahead decode (``decode_wa``).
    kv rows target the null page; rec/conv rows target the dead slot."""
    G, pl_ = cfg.num_groups, cfg.period - 1
    return {
        "rows": jnp.zeros((B, G, cfg.num_key_value_heads, 2, cfg.head_dim),
                          kv_dtype),
        "page_ids": jnp.zeros((B,), jnp.int32),
        "pslots": jnp.zeros((B,), jnp.int32),
        "rec": jnp.zeros((G, pl_, B, cfg.linear_num_value_heads,
                          cfg.linear_key_head_dim, cfg.linear_value_head_dim),
                         jnp.float32),
        "conv": jnp.zeros((G, pl_, B, cfg.linear_conv_kernel_dim, cfg.conv_dim),
                          jnp.float32),
        "state_slots": jnp.full((B,), max_slots, jnp.int32),
    }


def flush_pend(state, pend, live):
    """Write a pending record into (kv, rec, conv). Dead rows are redirected
    to the null page / dead slot. Per-row ``dynamic_update_slice`` chains —
    in place on donated buffers, unlike fancy-index scatters which copy the
    whole array per call on TPU (see qwen3.flush_pend)."""
    pid = jnp.where(live, pend["page_ids"], 0)
    dead = state["rec"].shape[2] - 1
    sslot = jnp.where(live, pend["state_slots"], dead)
    kv, rec, conv = state["kv"], state["rec"], state["conv"]
    rows = pend["rows"].astype(kv.dtype)
    B, G, Hkv, _, hd = rows.shape
    _, pl_, _, Hv, dk, dv = pend["rec"].shape
    K, cd = pend["conv"].shape[-2:]
    for b in range(B):
        kv = lax.dynamic_update_slice(
            kv, rows[b].reshape(G, Hkv, 1, 2, 1, hd),
            (0, 0, pid[b], 0, pend["pslots"][b], 0))
        rec = lax.dynamic_update_slice(
            rec, pend["rec"][:, :, b].reshape(G, pl_, 1, Hv, dk, dv),
            (0, 0, sslot[b], 0, 0, 0))
        conv = lax.dynamic_update_slice(
            conv, pend["conv"][:, :, b].reshape(G, pl_, 1, K, cd),
            (0, 0, sslot[b], 0, 0))
    return {"kv": kv, "rec": rec, "conv": conv}


# ── Flat UNION decode layout (single-device serving) ────────────────────
# MEASURED (round 3, docs/PERF.md): XLA's scan pipelining only prefetches
# weights when the scan iterates PER LAYER with that layer's weights as the
# xs slice. The grouped layout (leaves [G, p-1, ...], one scan iteration =
# a whole period) streams at ~250 GB/s — prefetch fails on the ~400 MB
# per-iteration slices — vs ~600 GB/s for a flat per-layer scan at the same
# shapes; unrolling is even worse (no prefetch at all). But the hybrid's
# depth order interleaves layer TYPES, so a flat scan needs a UNION xs: the
# linear and full layers' big matrices pack into shared per-layer slots
# (they happen to match: wv↔wq, wz↔wgate, out_proj↔wo, shared MLP), and a
# lax.cond picks the branch — only the taken branch's dot reads stream.
# TP serving keeps the grouped layout (packing would split sharded head
# axes across pack boundaries); this layout is built once at load when
# tp == 1 (make_runtime(flat_decode=True)).


def _union_dims(cfg: Qwen35Config):
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    w1 = max(cfg.value_dim, qd)
    w3 = max(2 * cfg.key_dim, 2 * kvd)
    m = max(cfg.linear_value_head_dim, cfg.head_dim)
    return qd, kvd, w1, w3, m


def to_union(cfg: Qwen35Config, params):
    """Grouped params → flat union layout (one-time, at load).

    CONSUMES ``params``: each grouped leaf is dropped right after its
    union slot is built, so peak device memory stays ~one leaf above the
    steady footprint (a full second copy OOMs a 16 GB chip — measured)."""
    if "union" in params:
        return params
    p, G, pl_ = cfg.period, cfg.num_groups, cfg.period - 1
    Lt = cfg.num_hidden_layers
    D, I = cfg.hidden_size, cfg.intermediate_size
    kd, vd = cfg.key_dim, cfg.value_dim
    Hv = cfg.linear_num_value_heads
    K, C = cfg.linear_conv_kernel_dim, cfg.conv_dim
    qd, kvd, w1, w3, m = _union_dims(cfg)
    lin, full = dict(params["lin"]), dict(params["full"])
    params["lin"].clear()
    params["full"].clear()
    lin_rows = np.asarray([g * p + j for g in range(G) for j in range(pl_)])
    full_rows = np.asarray([g * p + (p - 1) for g in range(G)])

    def is_q(w):
        return isinstance(w, dict)  # int8 {"q8","s"}

    def pack2(lin_parts, full_parts, width, dtype=None):
        """One [Lt, D_in, width] leaf from (col_offset, [G(,pl),in,out])
        pieces. Handles int8 dict leaves (q8 packed per slot, s per col)."""
        sample = lin_parts[0][1] if lin_parts else full_parts[0][1]
        if is_q(sample):
            q8 = pack2([(o, w["q8"]) for o, w in lin_parts],
                       [(o, w["q8"]) for o, w in full_parts], width,
                       jnp.int8)
            s = jnp.zeros((Lt, width), jnp.float32)
            for off, w in lin_parts:
                s = s.at[lin_rows, off:off + w["s"].shape[-1]].set(
                    w["s"].reshape(G * pl_, -1))
            for off, w in full_parts:
                s = s.at[full_rows, off:off + w["s"].shape[-1]].set(
                    w["s"].reshape(G, -1))
            return {"q8": q8, "s": s}
        din = sample.shape[-2]
        dt = dtype or sample.dtype
        out = jnp.zeros((Lt, din, width), dt)
        for off, w in lin_parts:
            out = out.at[lin_rows, :, off:off + w.shape[-1]].set(
                w.reshape(G * pl_, din, -1).astype(dt))
        for off, w in full_parts:
            out = out.at[full_rows, :, off:off + w.shape[-1]].set(
                w.reshape(G, din, -1).astype(dt))
        return out

    def vec(lin_w, full_w, width, dtype=jnp.float32):
        out = jnp.zeros((Lt, width), dtype)
        if lin_w is not None:
            for off, w in lin_w:
                out = out.at[lin_rows, off:off + w.shape[-1]].set(
                    w.reshape(G * pl_, -1).astype(dtype))
        if full_w is not None:
            for off, w in full_w:
                out = out.at[full_rows, off:off + w.shape[-1]].set(
                    w.reshape(G, -1).astype(dtype))
        return out

    dt_v = lin["input_ln"].dtype
    u = {}
    u["a1"] = pack2([(0, lin.pop("wv"))], [(0, full.pop("wq"))], w1)
    u["a2"] = pack2([(0, lin.pop("wz"))], [(0, full.pop("wgate"))], w1)
    u["a3"] = pack2([(0, lin.pop("wq")), (kd, lin.pop("wk"))],
                    [(0, full.pop("wk")), (kvd, full.pop("wv"))], w3)
    u["gu"] = pack2([(0, lin.pop("mlp_gate_up"))],
                    [(0, full.pop("mlp_gate_up"))], 2 * I)
    u["dn"] = pack2([(0, lin.pop("mlp_down"))],
                    [(0, full.pop("mlp_down"))], cfg.hidden_size)
    u["ba"] = pack2([(0, lin.pop("wb")), (Hv, lin.pop("wa"))], [], 2 * Hv)
    u["input_ln"] = vec([(0, lin.pop("input_ln"))],
                        [(0, full.pop("input_ln"))], D, dt_v)
    u["post_ln"] = vec([(0, lin.pop("post_ln"))],
                       [(0, full.pop("post_ln"))], D, dt_v)
    u["nv"] = vec([(0, lin.pop("norm_w"))],
                  [(0, full.pop("q_norm")), (m, full.pop("k_norm"))],
                  2 * m, dt_v)
    u["ad"] = vec([(0, lin.pop("A_log")), (Hv, lin.pop("dt_bias"))], None,
                  2 * Hv)
    u["conv_w"] = jnp.zeros((Lt, C, K), jnp.float32).at[lin_rows].set(
        lin.pop("conv_w").reshape(G * pl_, C, K).astype(jnp.float32))
    # a4 differs: input axis varies (lin vd-in, full qd-in), output D
    op, wo = lin.pop("out_proj"), full.pop("wo")
    if is_q(op):
        q8 = jnp.zeros((Lt, w1, D), jnp.int8)
        q8 = q8.at[lin_rows, :vd].set(op["q8"].reshape(G * pl_, vd, D))
        q8 = q8.at[full_rows, :qd].set(wo["q8"])
        s = jnp.zeros((Lt, D), jnp.float32)
        s = s.at[lin_rows].set(op["s"].reshape(G * pl_, D))
        s = s.at[full_rows].set(wo["s"].reshape(G, D))
        u["a4"] = {"q8": q8, "s": s}
    else:
        a4 = jnp.zeros((Lt, w1, D), op.dtype)
        a4 = a4.at[lin_rows, :vd].set(op.reshape(G * pl_, vd, D))
        a4 = a4.at[full_rows, :qd].set(wo.reshape(G, qd, D))
        del op, wo
        u["a4"] = a4
    return {
        "embed": params["embed"],
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
        "union": u,
    }


def _slice_w(w, in_sl=None, out_sl=None):
    """Slice a (possibly int8-dict) weight on input/output axes."""
    if isinstance(w, dict):
        q8 = w["q8"]
        s = w["s"]
        if in_sl is not None:
            q8 = q8[..., in_sl, :]
        if out_sl is not None:
            q8 = q8[..., out_sl]
            s = s[..., out_sl]
        return {"q8": q8, "s": s}
    if in_sl is not None:
        w = w[..., in_sl, :]
    if out_sl is not None:
        w = w[..., out_sl]
    return w


def _union_lw(cfg: Qwen35Config, u):
    """Per-layer union slice → linear-layer weight dict (trace-time views)."""
    kd, vd = cfg.key_dim, cfg.value_dim
    Hv, dv = cfg.linear_num_value_heads, cfg.linear_value_head_dim
    return {
        "input_ln": u["input_ln"], "post_ln": u["post_ln"],
        "wq": _slice_w(u["a3"], out_sl=slice(0, kd)),
        "wk": _slice_w(u["a3"], out_sl=slice(kd, 2 * kd)),
        "wv": _slice_w(u["a1"], out_sl=slice(0, vd)),
        "wz": _slice_w(u["a2"], out_sl=slice(0, vd)),
        "wb": _slice_w(u["ba"], out_sl=slice(0, Hv)),
        "wa": _slice_w(u["ba"], out_sl=slice(Hv, 2 * Hv)),
        "A_log": u["ad"][..., :Hv], "dt_bias": u["ad"][..., Hv:2 * Hv],
        "conv_w": u["conv_w"],
        "norm_w": u["nv"][..., :dv],
        "out_proj": _slice_w(u["a4"], in_sl=slice(0, vd)),
        "mlp_gate_up": u["gu"], "mlp_down": u["dn"],
    }


def _union_fw(cfg: Qwen35Config, u):
    """Per-layer union slice → full-attention weight dict."""
    qd, kvd, w1, w3, m = _union_dims(cfg)
    return {
        "input_ln": u["input_ln"], "post_ln": u["post_ln"],
        "wq": _slice_w(u["a1"], out_sl=slice(0, qd)),
        "wgate": _slice_w(u["a2"], out_sl=slice(0, qd)),
        "wk": _slice_w(u["a3"], out_sl=slice(0, kvd)),
        "wv": _slice_w(u["a3"], out_sl=slice(kvd, 2 * kvd)),
        "q_norm": u["nv"][..., :cfg.head_dim],
        "k_norm": u["nv"][..., m:m + cfg.head_dim],
        "wo": _slice_w(u["a4"], in_sl=slice(0, qd)),
        "mlp_gate_up": u["gu"], "mlp_down": u["dn"],
    }


def _group_xs(cfg: Qwen35Config, params):
    """Group-wise prefill scan inputs + per-layer weight accessors.

    Union params: the xs are CONTIGUOUS ``[G, p, ...]`` reshapes of the
    union leaves (free — no copy), and the per-layer weights are built by
    `_union_lw`/`_union_fw` on statically-indexed slices of the scan's own
    xs slice.  The previous path (`_grouped_view`) fed the prefill scan
    strided ``[:, :p-1]`` slices, which XLA materializes — a ~whole-model
    copy per prefill dispatch (TTFT 118 → 130 ms regression, docs/PERF.md
    round-3 union section).  Grouped params pass through unchanged (TP).

    Returns ``(wxs, lw_at, fw_of)`` where ``wxs`` joins ``jnp.arange(G)``
    as scan xs and, given the scan's per-iteration slice ``wg``,
    ``lw_at(wg, j)`` is linear-layer ``j``'s weights and ``fw_of(wg)`` the
    full-attention layer's."""
    G, p = cfg.num_groups, cfg.period
    if "union" in params:
        wxs = jax.tree.map(lambda a: a.reshape(G, p, *a.shape[1:]),
                           params["union"])

        def lw_at(wg, j):
            return _union_lw(cfg, jax.tree.map(lambda a: a[j], wg))

        def fw_of(wg):
            return _union_fw(cfg, jax.tree.map(lambda a: a[p - 1], wg))

        return wxs, lw_at, fw_of

    def lw_at(wg, j):
        return jax.tree.map(lambda a: a[j], wg[0])

    def fw_of(wg):
        return wg[1]

    return (params["lin"], params["full"]), lw_at, fw_of


def _grouped_view(cfg: Qwen35Config, params):
    """Union params → the grouped pytree the prefill paths consume.

    Pure reshapes + row/column slices of the union leaves (zero-copy until
    consumed; prefill amortizes any residual materialization over its
    chunk). Lets every non-decode path keep its existing grouped code."""
    if "union" not in params:
        return params
    p, G = cfg.period, cfg.num_groups

    def rows_lin(a):
        if isinstance(a, dict):
            return {k: rows_lin(v) for k, v in a.items()}
        return a.reshape(G, p, *a.shape[1:])[:, :p - 1]

    def rows_full(a):
        if isinstance(a, dict):
            return {k: rows_full(v) for k, v in a.items()}
        return a.reshape(G, p, *a.shape[1:])[:, p - 1]

    u = params["union"]
    ulin = {k: rows_lin(v) for k, v in u.items()}
    ufull = {k: rows_full(v) for k, v in u.items()}
    lin = _union_lw(cfg, ulin)
    full = _union_fw(cfg, ufull)
    return {
        "embed": params["embed"],
        "lin": lin,
        "full": full,
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
    }


def decode_wa_flat(cfg: Qwen35Config, params, state, pend, tokens, positions,
                   page_tables, seq_lens, slots, use_pallas: bool = False):
    """Write-ahead decode over the flat union layout: ONE scan over all
    ``num_hidden_layers`` iterations, per-layer union slice as the xs (the
    structure XLA's scan prefetch pipelines — see the section comment),
    lax.cond dispatching the layer type. Semantics identical to the
    grouped ``decode_wa`` (pinned by tests)."""
    B = tokens.shape[0]
    p = cfg.period
    pl_ = p - 1
    Lt = cfg.num_hidden_layers
    page_size = state["kv"].shape[4]
    state = flush_pend(state, pend, jnp.ones((B,), bool))
    x = params["embed"][tokens]
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    page_ids = jnp.take_along_axis(
        page_tables, (positions // page_size)[:, None], axis=1
    )[:, 0]
    pslots = positions % page_size
    kv0, rec0, conv0 = state["kv"], state["rec"], state["conv"]
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    Hv, dk, dv = (cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                  cfg.linear_value_head_dim)
    K, C = cfg.linear_conv_kernel_dim, cfg.conv_dim

    def layer(x, xs):
        li, u = xs
        gi = li // p
        j = jnp.minimum(li % p, pl_ - 1)  # clipped: full rows never read it
        is_full = (li % p) == pl_

        def lin_fn(x):
            lw = _union_lw(cfg, u)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)
            conv_rows = conv0[gi, j, slots]
            y, conv_rows = gdn.causal_conv1d_step(mixed, lw["conv_w"], conv_rows)
            q, k, v = _gdn_split_heads(cfg, y)
            rec_rows = rec0[gi, j, slots]
            out, rec_rows = gdn.gdn_step(q, k, v, g, beta, rec_rows)
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x = x + _proj(lw, "out_proj", out.reshape(B, -1))
            kv_row = jnp.zeros((B, Hkv, 2, hd), kv0.dtype)
            return x, kv_row, rec_rows, conv_rows

        def full_fn(x):
            fw = _union_fw(cfg, u)
            h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
            q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
            if use_pallas:
                from pegainfer_tpu.ops.pallas import paged_attention_decode

                o = paged_attention_decode(
                    q, kv0, kv0, page_tables, seq_lens, scale,
                    cur_k=k, cur_v=v, layer_id=gi,
                    fold_heads=page_tables.shape[1] * page_size >= 8192)
            else:
                layer_kv = lax.dynamic_index_in_dim(kv0, gi, axis=0,
                                                    keepdims=False)
                o = att.paged_attention_decode(
                    q, layer_kv[:, :, 0], layer_kv[:, :, 1],
                    page_tables, seq_lens, scale, cur_k=k, cur_v=v)
            o = o.reshape(B, -1) * jax.nn.sigmoid(
                gate.astype(jnp.float32)).astype(x.dtype)
            x = x + _proj(fw, "wo", o)
            kv_row = jnp.stack([k, v], axis=2).astype(kv0.dtype)
            rec_rows = jnp.zeros((B, Hv, dk, dv), jnp.float32)
            conv_rows = jnp.zeros((B, K, C), jnp.float32)
            return x, kv_row, rec_rows, conv_rows

        x, kv_row, rec_rows, conv_rows = lax.cond(is_full, full_fn, lin_fn, x)
        # shared MLP (identical shapes both types — hoisted out of the cond)
        h = rms_norm(x, u["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp({"mlp_gate_up": u["gu"], "mlp_down": u["dn"]}, h)
        return x, (kv_row, rec_rows, conv_rows)

    x, (kv_rows, rec_all, conv_all) = lax.scan(
        layer, x,
        (jnp.arange(Lt, dtype=jnp.int32), params["union"]),
    )
    G = cfg.num_groups
    # re-slice the flat ys into the grouped pend format (flush unchanged)
    pend = {
        # full rows: [G, B, Hkv, 2, hd] → [B, G, Hkv, 2, hd]
        "rows": kv_rows.reshape(G, p, B, Hkv, 2, hd)[:, p - 1]
                .transpose(1, 0, 2, 3, 4),
        "page_ids": page_ids,
        "pslots": pslots,
        "rec": rec_all.reshape(G, p, B, Hv, dk, dv)[:, :p - 1],
        "conv": conv_all.reshape(G, p, B, K, C)[:, :p - 1],
        "state_slots": slots,
    }
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    logits = _proj(params, "lm_head", x).astype(jnp.float32)
    return state, pend, logits


def decode_wa(cfg: Qwen35Config, params, state, pend, tokens, positions,
              page_tables, seq_lens, slots, use_pallas: bool = False):
    """One WRITE-AHEAD decode step (see qwen3.decode_wa for the rationale —
    state arrays are written exactly once, in place, at the start; the layer
    scan only reads; this step's new rows return as ``pend``). Padding rows:
    seq_lens == 0 and slots == dead slot.
    Returns (state, pend', logits [B, V] f32)."""
    if "union" in params:
        return decode_wa_flat(cfg, params, state, pend, tokens, positions,
                              page_tables, seq_lens, slots,
                              use_pallas=use_pallas)
    B = tokens.shape[0]
    page_size = state["kv"].shape[4]
    state = flush_pend(state, pend, jnp.ones((B,), bool))
    x = params["embed"][tokens]
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    page_ids = jnp.take_along_axis(
        page_tables, (positions // page_size)[:, None], axis=1
    )[:, 0]
    pslots = positions % page_size

    kv0, rec0, conv0 = state["kv"], state["rec"], state["conv"]

    def group(x, inputs):
        gi, lin_g, full_g = inputs
        rec_new, conv_new = [], []

        for j in range(cfg.period - 1):
            lw = jax.tree.map(lambda a: a[j], lin_g)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)
            conv_rows = conv0[gi, j, slots]  # [B, K, conv_dim]
            y, conv_rows = gdn.causal_conv1d_step(mixed, lw["conv_w"], conv_rows)
            conv_new.append(conv_rows)
            q, k, v = _gdn_split_heads(cfg, y)
            rec_rows = rec0[gi, j, slots]  # [B, Hv, dk, dv]
            out, rec_rows = gdn.gdn_step(q, k, v, g, beta, rec_rows)
            rec_new.append(rec_rows)
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x = x + _proj(lw, "out_proj", out.reshape(B, -1))
            h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
            x = x + _mlp(lw, h)

        fw = full_g
        h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
        q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
        if use_pallas:
            from pegainfer_tpu.ops.pallas import paged_attention_decode

            # full-pool form: the kernel DMAs kv0[gi, h, page] directly
            # (one DMA per page fetches the k/v-adjacent [2, ps, hd] block);
            # fold_heads at long context (see models/qwen3.py decode_wa)
            o = paged_attention_decode(
                q, kv0, kv0, page_tables, seq_lens, scale, cur_k=k, cur_v=v,
                layer_id=gi,
                fold_heads=page_tables.shape[1] * kv0.shape[-2] >= 8192)
        else:
            layer_kv = lax.dynamic_index_in_dim(kv0, gi, axis=0, keepdims=False)
            o = att.paged_attention_decode(q, layer_kv[:, :, 0],
                                           layer_kv[:, :, 1],
                                           page_tables, seq_lens, scale,
                                           cur_k=k, cur_v=v)
        o = o.reshape(B, -1) * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        x = x + _proj(fw, "wo", o)
        h = rms_norm(x, fw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(fw, h)
        return x, (k, v, jnp.stack(rec_new), jnp.stack(conv_new))

    G = cfg.num_groups
    if os.environ.get("PEGAINFER_Q35_UNROLL") == "1":
        # perf probe: unrolled groups let XLA schedule weight prefetch
        # across group boundaries (scan bodies are scheduling barriers)
        ys = []
        for gi in range(G):
            lin_g = jax.tree.map(lambda a: a[gi], params["lin"])
            full_g = jax.tree.map(lambda a: a[gi], params["full"])
            x, y = group(x, (jnp.int32(gi), lin_g, full_g))
            ys.append(y)
        k_all, v_all, rec_all, conv_all = (
            jnp.stack([y[i] for y in ys]) for i in range(4))
    else:
        x, (k_all, v_all, rec_all, conv_all) = lax.scan(
            group, x, (jnp.arange(G, dtype=jnp.int32), params["lin"], params["full"])
        )
    # this step's new rows ride out as the pend record (value layouts:
    # batch dims jump to the FRONT when the advanced indices are separated
    # by a slice — kv case — and stay in place when adjacent — rec/conv)
    pend = {
        # [G, B, Hkv, hd] ×2 → [B, G, Hkv, 2, hd]
        "rows": jnp.stack([k_all, v_all], axis=3).transpose(1, 0, 2, 3, 4)
                .astype(kv0.dtype),
        "page_ids": page_ids,
        "pslots": pslots,
        "rec": rec_all,    # [G, pl_, B, Hv, dk, dv]
        "conv": conv_all,  # [G, pl_, B, K, conv_dim]
        "state_slots": slots,
    }
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    logits = _proj(params, "lm_head", x).astype(jnp.float32)
    return state, pend, logits


def decode(cfg: Qwen35Config, params, state, tokens, positions, page_tables,
           seq_lens, slots, use_pallas: bool = False):
    """One decode step for a padded batch (self-contained form: all state
    rows are in place on return; the engine hot path uses ``decode_wa``).
    Padding rows: seq_lens == 0 and slots == dead slot.
    Returns (state, logits [B, V] f32)."""
    B = tokens.shape[0]
    pend = make_pend(cfg, B, state["rec"].shape[2] - 1, state["kv"].dtype)
    state, pend, logits = decode_wa(cfg, params, state, pend, tokens,
                                    positions, page_tables, seq_lens, slots,
                                    use_pallas=use_pallas)
    state = flush_pend(state, pend, jnp.ones((B,), bool))
    return state, logits


# ── Fused mixed step (prefill chunk ‖ decode rows, one dispatch) ────────
#
# The hybrid analog of qwen3.mixed_chunk_wa — the reference implements a
# unified forward for BOTH Qwen families; Qwen3.5's is
# pegainfer-qwen35-4b/src/unified_forward.rs:68-154 (prefill + decode rows
# combined, attention split). Here the chunk's Tc rows and one decode row
# per active stream share every GEMM (qkvzba / qgkv projections, out/wo,
# MLP, lm_head); only the sequence-mixing core splits: GDN chunkwise +
# conv-continuation for the chunk rows ‖ single-step recurrence + conv
# step for the decode rows, and full-attention splice-over-pool for the
# chunk ‖ paged decode attention for the streams.


def mixed_chunk_wa(cfg: Qwen35Config, params, state, cpend, dpend,
                   chunk_tokens, start_pos, valid, page_table, slot,
                   dec_tokens, dec_positions, dec_tables, dec_seq_lens,
                   dec_slots, gdn_chunk_size: int = 16,
                   use_pallas: bool = False, mode: str = None):
    """FUSED ragged mixed step: one dispatch runs a prefill chunk's Tc rows
    ‖ B decode rows through shared GEMMs (see the section comment). Both
    write-ahead pends land at the start (disjoint requests — a prefilling
    request is never decoding; its slot and the decode slots differ).
    Returns (state, cpend', dpend', last_logits [V], dec_logits [B, V]).
    """
    if mode is None:
        mode = os.environ.get("PEGAINFER_Q35_PREFILL", "flat")
    if "union" in params and mode == "flat":
        return mixed_chunk_wa_flat(
            cfg, params, state, cpend, dpend, chunk_tokens, start_pos,
            valid, page_table, slot, dec_tokens, dec_positions, dec_tables,
            dec_seq_lens, dec_slots, gdn_chunk_size=gdn_chunk_size,
            use_pallas=use_pallas)
    wxs, lw_at, fw_of = _group_xs(cfg, params)
    Tc = chunk_tokens.shape[0]
    B = dec_tokens.shape[0]
    N = Tc + B
    page_size = state["kv"].shape[4]
    chunk_sz = min(gdn_chunk_size, Tc)
    state = flush_chunk_pend(state, cpend)
    state = flush_pend(state, dpend, jnp.ones((B,), bool))
    x = params["embed"][jnp.concatenate([chunk_tokens, dec_tokens])]
    positions = jnp.concatenate(
        [start_pos + jnp.arange(Tc, dtype=jnp.int32), dec_positions])
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    local = jnp.arange(Tc, dtype=jnp.int32)
    valid_mask = (local < valid)[:, None]
    first_page = start_pos // page_size
    P = page_table.shape[0]
    S_len = P * page_size
    kv0, rec0, conv0 = state["kv"], state["rec"], state["conv"]
    dec_page_ids = jnp.take_along_axis(
        dec_tables, (dec_positions // page_size)[:, None], axis=1)[:, 0]
    dec_pslots = dec_positions % page_size
    fresh = (start_pos > 0)

    def group(x, inputs):
        gi, wg = inputs
        S_new, conv_new, recD_new, convD_new = [], [], [], []

        for j in range(cfg.period - 1):
            lw = lw_at(wg, j)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)  # shared GEMM [N]
            # chunk rows: conv continuation + chunkwise GDN from slot state
            prev_conv = jnp.where(fresh, conv0[gi, j, slot], 0.0)
            y_p, conv_state = gdn.causal_conv1d_cont(
                mixed[:Tc], lw["conv_w"], prev_conv, valid)
            conv_new.append(conv_state)
            qp, kp, vp = _gdn_split_heads(cfg, y_p)
            g_p = jnp.where(valid_mask, g[:Tc], 0.0)
            b_p = jnp.where(valid_mask, beta[:Tc], 0.0)
            S0 = jnp.where(fresh, rec0[gi, j, slot], 0.0)
            out_p, S = gdn.gdn_chunk(qp, kp, vp, g_p, b_p, S0, chunk=chunk_sz)
            S_new.append(S)
            # decode rows: single-step recurrence from per-stream slots
            conv_rows = conv0[gi, j, dec_slots]
            y_d, conv_rows = gdn.causal_conv1d_step(
                mixed[Tc:], lw["conv_w"], conv_rows)
            convD_new.append(conv_rows)
            qd, kd, vd = _gdn_split_heads(cfg, y_d)
            rec_rows = rec0[gi, j, dec_slots]
            out_d, rec_rows = gdn.gdn_step(qd, kd, vd, g[Tc:], beta[Tc:],
                                           rec_rows)
            recD_new.append(rec_rows)
            out = jnp.concatenate([out_p, out_d])
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x = x + _proj(lw, "out_proj", out.reshape(N, -1))
            h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
            x = x + _mlp(lw, h)

        fw = fw_of(wg)
        h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
        q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
        hd = q.shape[2]
        qp, kp, vp = q[:Tc], k[:Tc], v[:Tc]
        qd, kd, vd = q[Tc:], k[Tc:], v[Tc:]
        # chunk rows: pool gather + in-flight splice (= prefill_chunk_wa)
        kv_seq = kv0[gi, :, page_table]
        k_seq = kv_seq[:, :, 0].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
        v_seq = kv_seq[:, :, 1].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
        k_seq = lax.dynamic_update_slice(
            k_seq, kp.astype(k_seq.dtype), (start_pos, 0, 0))
        v_seq = lax.dynamic_update_slice(
            v_seq, vp.astype(v_seq.dtype), (start_pos, 0, 0))
        if use_pallas:
            from pegainfer_tpu.ops.pallas import (
                flash_attention, paged_attention_decode,
            )

            o_p = flash_attention(qp, k_seq, v_seq, start_pos + valid,
                                  start_pos, scale)
            o_d = paged_attention_decode(
                qd, kv0, kv0, dec_tables, dec_seq_lens, scale,
                cur_k=kd, cur_v=vd, layer_id=gi,
                fold_heads=dec_tables.shape[1] * page_size >= 8192)
        else:
            o_p = att.chunk_attention_seq(qp, k_seq, v_seq, start_pos, scale)
            layer_kv = lax.dynamic_index_in_dim(kv0, gi, axis=0,
                                                keepdims=False)
            o_d = att.paged_attention_decode(
                qd, layer_kv[:, :, 0], layer_kv[:, :, 1], dec_tables,
                dec_seq_lens, scale, cur_k=kd, cur_v=vd)
        o = jnp.concatenate([o_p.reshape(Tc, -1), o_d.reshape(B, -1)])
        o = o * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
        x = x + _proj(fw, "wo", o)
        h = rms_norm(x, fw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(fw, h)
        return x, (kp, vp, kd, vd, jnp.stack(S_new), jnp.stack(conv_new),
                   jnp.stack(recD_new), jnp.stack(convD_new))

    G = cfg.num_groups
    x, (kp_all, vp_all, kd_all, vd_all, S_all, convS_all, recD_all,
        convD_all) = lax.scan(group, x, (jnp.arange(G, dtype=jnp.int32), wxs))
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    nPc = Tc // page_size
    rows = (
        jnp.stack([kp_all, vp_all])
        .reshape(2, G, nPc, page_size, Hkv, hd)
        .transpose(2, 1, 4, 0, 3, 5)
        .astype(kv0.dtype)
    )
    chunk_table = lax.dynamic_slice_in_dim(page_table, first_page, nPc)
    cpend = {"rows": rows, "pages": chunk_table, "rec": S_all,
             "conv": convS_all, "slot": slot}
    dpend = {
        "rows": jnp.stack([kd_all, vd_all], axis=3).transpose(1, 0, 2, 3, 4)
        .astype(kv0.dtype),
        "page_ids": dec_page_ids,
        "pslots": dec_pslots,
        "rec": recD_all,
        "conv": convD_all,
        "state_slots": dec_slots,
    }
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    sel = jnp.concatenate([jnp.reshape(jnp.asarray(valid - 1, jnp.int32), (1,)),
                           Tc + jnp.arange(B, dtype=jnp.int32)])
    logits = _proj(params, "lm_head", x[sel]).astype(jnp.float32)
    return state, cpend, dpend, logits[0], logits[1:]


def mixed_chunk_wa_flat(cfg: Qwen35Config, params, state, cpend, dpend,
                        chunk_tokens, start_pos, valid, page_table, slot,
                        dec_tokens, dec_positions, dec_tables, dec_seq_lens,
                        dec_slots, gdn_chunk_size: int = 16,
                        use_pallas: bool = False):
    """Fused mixed step over the flat UNION layout (ONE scan over all
    layers with the per-layer union slice as xs — the structure XLA's scan
    prefetch pipelines; see the union section comment). Semantics identical
    to the grouped ``mixed_chunk_wa`` (pinned by tests)."""
    p, pl_ = cfg.period, cfg.period - 1
    G, Lt = cfg.num_groups, cfg.num_hidden_layers
    Tc = chunk_tokens.shape[0]
    B = dec_tokens.shape[0]
    N = Tc + B
    page_size = state["kv"].shape[4]
    chunk_sz = min(gdn_chunk_size, Tc)
    state = flush_chunk_pend(state, cpend)
    state = flush_pend(state, dpend, jnp.ones((B,), bool))
    x = params["embed"][jnp.concatenate([chunk_tokens, dec_tokens])]
    positions = jnp.concatenate(
        [start_pos + jnp.arange(Tc, dtype=jnp.int32), dec_positions])
    inv = jnp.asarray(rope_inv_freq(cfg.rotary_dim, cfg.rope_theta), jnp.float32)
    cos, sin = rope_cos_sin(positions, inv, x.dtype)
    scale = cfg.head_dim ** -0.5
    local = jnp.arange(Tc, dtype=jnp.int32)
    valid_mask = (local < valid)[:, None]
    first_page = start_pos // page_size
    P = page_table.shape[0]
    S_len = P * page_size
    kv0, rec0, conv0 = state["kv"], state["rec"], state["conv"]
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    Hv, dk, dv = (cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                  cfg.linear_value_head_dim)
    K, C = cfg.linear_conv_kernel_dim, cfg.conv_dim
    dec_page_ids = jnp.take_along_axis(
        dec_tables, (dec_positions // page_size)[:, None], axis=1)[:, 0]
    dec_pslots = dec_positions % page_size
    fresh = (start_pos > 0)

    def layer(x, xs):
        li, u = xs
        gi = li // p
        j = jnp.minimum(li % p, pl_ - 1)  # clipped: full rows never read it
        is_full = (li % p) == pl_

        def lin_fn(x):
            lw = _union_lw(cfg, u)
            h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
            mixed, z, g, beta = _gdn_project(cfg, lw, h)
            prev_conv = jnp.where(fresh, conv0[gi, j, slot], 0.0)
            y_p, conv_state = gdn.causal_conv1d_cont(
                mixed[:Tc], lw["conv_w"], prev_conv, valid)
            qp, kp, vp = _gdn_split_heads(cfg, y_p)
            g_p = jnp.where(valid_mask, g[:Tc], 0.0)
            b_p = jnp.where(valid_mask, beta[:Tc], 0.0)
            S0 = jnp.where(fresh, rec0[gi, j, slot], 0.0)
            out_p, S = gdn.gdn_chunk(qp, kp, vp, g_p, b_p, S0, chunk=chunk_sz)
            conv_rows = conv0[gi, j, dec_slots]
            y_d, conv_rows = gdn.causal_conv1d_step(
                mixed[Tc:], lw["conv_w"], conv_rows)
            qd, kd, vd = _gdn_split_heads(cfg, y_d)
            rec_rows = rec0[gi, j, dec_slots]
            out_d, rec_rows = gdn.gdn_step(qd, kd, vd, g[Tc:], beta[Tc:],
                                           rec_rows)
            out = jnp.concatenate([out_p, out_d])
            out = _gated_norm(cfg, lw["norm_w"], out, z).astype(x.dtype)
            x2 = x + _proj(lw, "out_proj", out.reshape(N, -1))
            kv_row = jnp.zeros((N, Hkv, 2, hd), kv0.dtype)
            return x2, kv_row, S, conv_state, rec_rows, conv_rows

        def full_fn(x):
            fw = _union_fw(cfg, u)
            h = rms_norm(x, fw["input_ln"], cfg.rms_norm_eps)
            q, k, v, gate = _full_qkv(cfg, fw, h, cos, sin)
            qp, kp, vp = q[:Tc], k[:Tc], v[:Tc]
            qd, kd, vd = q[Tc:], k[Tc:], v[Tc:]
            kv_seq = kv0[gi, :, page_table]
            k_seq = kv_seq[:, :, 0].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
            v_seq = kv_seq[:, :, 1].transpose(0, 2, 1, 3).reshape(S_len, -1, hd)
            k_seq = lax.dynamic_update_slice(
                k_seq, kp.astype(k_seq.dtype), (start_pos, 0, 0))
            v_seq = lax.dynamic_update_slice(
                v_seq, vp.astype(v_seq.dtype), (start_pos, 0, 0))
            if use_pallas:
                from pegainfer_tpu.ops.pallas import (
                    flash_attention, paged_attention_decode,
                )

                o_p = flash_attention(qp, k_seq, v_seq, start_pos + valid,
                                      start_pos, scale)
                o_d = paged_attention_decode(
                    qd, kv0, kv0, dec_tables, dec_seq_lens, scale,
                    cur_k=kd, cur_v=vd, layer_id=gi,
                    fold_heads=dec_tables.shape[1] * page_size >= 8192)
            else:
                o_p = att.chunk_attention_seq(qp, k_seq, v_seq, start_pos,
                                              scale)
                layer_kv = lax.dynamic_index_in_dim(kv0, gi, axis=0,
                                                    keepdims=False)
                o_d = att.paged_attention_decode(
                    qd, layer_kv[:, :, 0], layer_kv[:, :, 1], dec_tables,
                    dec_seq_lens, scale, cur_k=kd, cur_v=vd)
            o = jnp.concatenate([o_p.reshape(Tc, -1), o_d.reshape(B, -1)])
            o = o * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(x.dtype)
            x2 = x + _proj(fw, "wo", o)
            kv_row = jnp.concatenate(
                [jnp.stack([kp, vp], axis=2), jnp.stack([kd, vd], axis=2)]
            ).astype(kv0.dtype)
            S = jnp.zeros((Hv, dk, dv), jnp.float32)
            conv_state = jnp.zeros((K, C), jnp.float32)
            rec_rows = jnp.zeros((B, Hv, dk, dv), jnp.float32)
            conv_rows = jnp.zeros((B, K, C), jnp.float32)
            return x2, kv_row, S, conv_state, rec_rows, conv_rows

        x, kv_row, S, conv_state, rec_rows, conv_rows = lax.cond(
            is_full, full_fn, lin_fn, x)
        h = rms_norm(x, u["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp({"mlp_gate_up": u["gu"], "mlp_down": u["dn"]}, h)
        return x, (kv_row, S, conv_state, rec_rows, conv_rows)

    x, (kv_rows, S_flat, convS_flat, recD_flat, convD_flat) = lax.scan(
        layer, x, (jnp.arange(Lt, dtype=jnp.int32), params["union"]))

    kvr = kv_rows.reshape(G, p, N, Hkv, 2, hd)[:, p - 1]  # [G, N, Hkv, 2, hd]
    S_all = S_flat.reshape(G, p, Hv, dk, dv)[:, :pl_]
    convS_all = convS_flat.reshape(G, p, K, C)[:, :pl_]
    recD_all = recD_flat.reshape(G, p, B, Hv, dk, dv)[:, :pl_]
    convD_all = convD_flat.reshape(G, p, B, K, C)[:, :pl_]
    nPc = Tc // page_size
    rows = (
        kvr[:, :Tc].transpose(3, 0, 1, 2, 4)  # [2, G, Tc, Hkv, hd]
        .reshape(2, G, nPc, page_size, Hkv, hd)
        .transpose(2, 1, 4, 0, 3, 5)
        .astype(kv0.dtype)
    )
    chunk_table = lax.dynamic_slice_in_dim(page_table, first_page, nPc)
    cpend = {"rows": rows, "pages": chunk_table, "rec": S_all,
             "conv": convS_all, "slot": slot}
    dpend = {
        "rows": kvr[:, Tc:].transpose(1, 0, 2, 3, 4),  # [B, G, Hkv, 2, hd]
        "page_ids": dec_page_ids,
        "pslots": dec_pslots,
        "rec": recD_all,
        "conv": convD_all,
        "state_slots": dec_slots,
    }
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    sel = jnp.concatenate([jnp.reshape(jnp.asarray(valid - 1, jnp.int32), (1,)),
                           Tc + jnp.arange(B, dtype=jnp.int32)])
    logits = _proj(params, "lm_head", x[sel]).astype(jnp.float32)
    return state, cpend, dpend, logits[0], logits[1:]


# ── Runtime bundle ───────────────────────────────────────────────────────


def export_pages(state, page_ids):
    """PD handoff gather: kv [G,Hkv,pages,2,ps,hd] x ids [n]."""
    return jnp.take(state["kv"], page_ids, axis=2)


def import_pages(state, rows, page_ids):
    kv = state["kv"]
    for i in range(rows.shape[2]):
        upd = lax.dynamic_slice_in_dim(rows, i, 1, axis=2)
        kv = lax.dynamic_update_slice(
            kv, upd.astype(kv.dtype), (0, 0, page_ids[i], 0, 0, 0))
    return {**state, "kv": kv}


def slot_export(state, slot):
    """Per-slot GDN/conv state rows (post-prefill, flushed form)."""
    return {"rec": state["rec"][:, :, slot], "conv": state["conv"][:, :, slot]}


def slot_import(state, snap, slot):
    rec = lax.dynamic_update_slice(
        state["rec"], snap["rec"][:, :, None].astype(state["rec"].dtype),
        (0, 0, slot, 0, 0, 0))
    conv = lax.dynamic_update_slice(
        state["conv"], snap["conv"][:, :, None].astype(state["conv"].dtype),
        (0, 0, slot, 0, 0))
    return {**state, "rec": rec, "conv": conv}


def cpend_snapshot(cpend):
    """State part of a chunk pend (= the slot's GDN/conv state at the chunk
    boundary), copied — the pend itself is donated into the next chunk."""
    return {"rec": jnp.copy(cpend["rec"]), "conv": jnp.copy(cpend["conv"])}


def cpend_restore(cpend, snap, slot: int):
    """Seed a fresh chunk pend with a cached prefix snapshot for ``slot``.
    The rows/pages parts stay zeros (null-page writes on flush); copies keep
    the cached snapshot alive across the pend's donation."""
    return dict(
        cpend,
        rec=jnp.copy(snap["rec"]),
        conv=jnp.copy(snap["conv"]),
        slot=jnp.int32(slot),
    )


def make_runtime(cfg: Qwen35Config, params, num_pages: int, page_size: int = 16,
                 max_slots: int = 64, kv_dtype=jnp.bfloat16,
                 use_pallas=None, flat_decode: bool = False,
                 prefill_mode: str = None):
    """``flat_decode``: convert params to the flat UNION layout once (the
    single-device serving layout; decode streams ~2.4x faster — see the
    union section). TP callers must keep the grouped layout (default):
    the packed slots would split sharded head axes."""
    from pegainfer_tpu.engine.jax_executor import ModelRuntime
    from pegainfer_tpu.models.qwen3 import use_pallas_default

    if flat_decode:
        params = to_union(cfg, params)
    # resolve the prefill layout ONCE (the env var is trace-time state;
    # changing it after the executor jits these fns would be silent)
    pmode = prefill_mode or os.environ.get("PEGAINFER_Q35_PREFILL", "flat")
    up = use_pallas_default() if use_pallas is None else use_pallas
    # Mosaic wants the DMA'd [page, head_dim] blocks lane-aligned
    up = up and cfg.head_dim % 128 == 0
    state = make_state(cfg, num_pages, page_size, max_slots, kv_dtype)
    return ModelRuntime(
        prefill_fn=lambda w, s, t, sl, pt, slot: prefill(cfg, w, s, t, sl, pt, slot,
                                                         use_pallas=up,
                                                         mode=pmode),
        prefill_all_logits_fn=lambda w, s, t, sl, pt, slot: prefill(
            cfg, w, s, t, sl, pt, slot, return_all_logits=True, use_pallas=up,
            mode=pmode
        ),
        decode_fn=lambda w, s, t, p, pt, sl, slots: decode(
            cfg, w, s, t, p, pt, sl, slots, use_pallas=up
        ),
        decode_wa_fn=lambda w, s, pend, t, p, pt, sl, slots: decode_wa(
            cfg, w, s, pend, t, p, pt, sl, slots, use_pallas=up
        ),
        make_pend_fn=lambda B: make_pend(cfg, B, max_slots, kv_dtype),
        flush_pend_fn=flush_pend,
        prefill_chunk_wa_fn=lambda w, s, cpend, t, sp, va, pt, slot:
            prefill_chunk_wa(cfg, w, s, cpend, t, sp, va, pt, slot,
                             use_pallas=up, mode=pmode),
        prefill_chunk_wa_all_fn=lambda w, s, cpend, t, sp, va, pt, slot:
            prefill_chunk_wa(cfg, w, s, cpend, t, sp, va, pt, slot,
                             use_pallas=up, return_all_logits=True,
                             mode=pmode),
        make_chunk_pend_fn=lambda nP: make_chunk_pend(cfg, nP, page_size,
                                                      max_slots, kv_dtype),
        flush_chunk_pend_fn=flush_chunk_pend,
        mixed_chunk_wa_fn=lambda w, s, cpend, dpend, t, sp, va, pt, slot,
            dt, dp, dtabs, dsl, dslots: mixed_chunk_wa(
                cfg, w, s, cpend, dpend, t, sp, va, pt, slot, dt, dp, dtabs,
                dsl, dslots, use_pallas=up, mode=pmode),
        prefill_chunk_fn=lambda w, s, t, sp, va, pt, slot: prefill_chunk(
            cfg, w, s, t, sp, va, pt, slot, use_pallas=up
        ),
        params=params,
        state=state,
        page_size=page_size,
        num_pages=num_pages,
        stop_token_ids=frozenset(cfg.stop_token_ids),
        max_model_len=cfg.max_position_embeddings,
        vocab_size=cfg.vocab_size,
        max_slots=max_slots,
        # hybrid prefix cache: GDN/conv state snapshots ride the chunk pend
        # (docs/prefix-cache-design.md "Hybrid/DSv4 caveat")
        supports_prefix_cache=True,
        cpend_snapshot_fn=cpend_snapshot,
        cpend_restore_fn=cpend_restore,
        export_pages_fn=export_pages,
        import_pages_fn=import_pages,
        slot_export_fn=slot_export,
        slot_import_fn=slot_import,
    )
