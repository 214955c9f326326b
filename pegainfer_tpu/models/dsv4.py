"""DeepSeek-V4-Flash — TPU-native forward (MoE + DSA + hyper-connections).

Capability parity with the reference pegainfer-deepseek-v4 crate: config
(src/config.rs:82-244), weight schema (src/model.rs:9-744), block flow
(src/runtime/block.rs), attention/indexer/compressor/moe math re-derived
from the CUDA/TileLang kernels (see ops/dsa.py, ops/hc.py, ops/quant.py
docstrings for the per-op provenance).

Architecture recap: 64-head MLA-style attention over a single joint 512-d
KV vector per token, q/o through LoRA factorizations, per-head sink logits;
per-layer compress_ratios select dense sliding-window (0), nonoverlap
compressed (r∉{0,4}) or overlap compressed + lightning-indexer top-k (4)
attention; MoE with hash-gate (first n_hash_layers) or score-gate routing,
shared + routed experts (FP8/FP4 weights); residual stream is hc_mult
hyper-connection streams.

This v1 keeps weights dequantized-to-bf16 at load (`QuantMode.DEQUANT`) or
quantized-in-HBM with on-the-fly dequant linears; layers run as an unrolled
Python loop (the real checkpoint is multi-host — scan-grouping and the
grouped expert GEMMs are staged optimizations). Greedy serving only, like
the reference (direct scheduler, SURVEY.md §2.1).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pegainfer_tpu.ops import dsa, hc, quant


@dataclass(frozen=True)
class DSv4Config:
    vocab_size: int
    dim: int
    moe_inter_dim: int
    n_layers: int
    num_attention_heads: int
    head_dim: int
    q_lora_rank: int
    qk_rope_head_dim: int
    o_groups: int
    o_lora_rank: int
    sliding_window: int
    n_routed_experts: int
    n_shared_experts: int
    n_activated_experts: int
    n_hash_layers: int
    routed_scaling_factor: float
    swiglu_limit: float
    rms_norm_eps: float
    index_n_heads: int
    index_head_dim: int
    index_topk: int
    max_position_embeddings: int
    rope_theta: float
    compress_rope_theta: float
    compress_ratios: tuple
    yarn_factor: float = 16.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    yarn_original_seq_len: int = 65536
    hc_mult: int = 4
    hc_sinkhorn_iters: int = 20
    hc_eps: float = 1.0e-6
    bos_token_id: int = 0
    eos_token_id: int = 1

    @staticmethod
    def from_model_path(model_path: str) -> "DSv4Config":
        with open(os.path.join(model_path, "config.json")) as f:
            c = json.load(f)
        rs = c["rope_scaling"]
        return DSv4Config(
            vocab_size=c["vocab_size"],
            dim=c["hidden_size"],
            moe_inter_dim=c["moe_intermediate_size"],
            n_layers=c["num_hidden_layers"],
            num_attention_heads=c["num_attention_heads"],
            head_dim=c["head_dim"],
            q_lora_rank=c["q_lora_rank"],
            qk_rope_head_dim=c["qk_rope_head_dim"],
            o_groups=c["o_groups"],
            o_lora_rank=c["o_lora_rank"],
            sliding_window=c["sliding_window"],
            n_routed_experts=c["n_routed_experts"],
            n_shared_experts=c["n_shared_experts"],
            n_activated_experts=c["num_experts_per_tok"],
            n_hash_layers=c["num_hash_layers"],
            routed_scaling_factor=c["routed_scaling_factor"],
            swiglu_limit=c["swiglu_limit"],
            rms_norm_eps=c["rms_norm_eps"],
            index_n_heads=c["index_n_heads"],
            index_head_dim=c["index_head_dim"],
            index_topk=c["index_topk"],
            max_position_embeddings=c["max_position_embeddings"],
            rope_theta=c["rope_theta"],
            compress_rope_theta=c["compress_rope_theta"],
            compress_ratios=tuple(c["compress_ratios"][: c["num_hidden_layers"]]),
            yarn_factor=rs["factor"],
            yarn_beta_fast=rs["beta_fast"],
            yarn_beta_slow=rs["beta_slow"],
            yarn_original_seq_len=rs["original_max_position_embeddings"],
            hc_mult=c.get("hc_mult", 4),
            hc_sinkhorn_iters=c.get("hc_sinkhorn_iters", 20),
            hc_eps=c.get("hc_eps", 1.0e-6),
            bos_token_id=c["bos_token_id"],
            eos_token_id=c["eos_token_id"],
        )

    def rope_inv_freq(self, layer: int) -> np.ndarray:
        """Per-layer inv_freq: YaRN only on compressed-attention layers
        (reference precompute_rope_cache, attention_base.rs:110-151)."""
        if self.compress_ratios[layer] > 0:
            return dsa.yarn_inv_freq(
                self.qk_rope_head_dim, self.compress_rope_theta,
                self.yarn_factor, self.yarn_beta_fast, self.yarn_beta_slow,
                self.yarn_original_seq_len,
            )
        return dsa.yarn_inv_freq(
            self.qk_rope_head_dim, self.rope_theta, 1.0, 0.0, 0.0, 0
        )


# ── Random init (tests / benches; checkpoint loader mirrors this layout) ──


def init_random_params(cfg: DSv4Config, seed: int = 0, dtype=jnp.bfloat16,
                       scale: float = 0.05) -> Dict[str, Any]:
    """Params at the given config's shapes (HF-free: the real checkpoint is
    the mp8 rank-manifest format; `load_rank_params` maps it here)."""
    rng = np.random.default_rng(seed)
    D, n = cfg.dim, cfg.hc_mult
    H, hd = cfg.num_attention_heads, cfg.head_dim
    rd = cfg.qk_rope_head_dim
    mix_hc = (2 + n) * n

    def w(*shape, s=scale):
        return jnp.asarray(rng.normal(0, s, shape), dtype)

    def f32(*shape, s=scale):
        return jnp.asarray(rng.normal(0, s, shape), jnp.float32)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    layers = []
    for li in range(cfg.n_layers):
        ratio = cfg.compress_ratios[li]
        lw: Dict[str, Any] = {
            "attn_norm": ones(D),
            "ffn_norm": ones(D),
            "hc_attn_fn": f32(mix_hc, n * D, s=0.2),
            "hc_attn_base": f32(mix_hc, s=0.5),
            "hc_attn_scale": jnp.ones((3,), jnp.float32),
            "hc_ffn_fn": f32(mix_hc, n * D, s=0.2),
            "hc_ffn_base": f32(mix_hc, s=0.5),
            "hc_ffn_scale": jnp.ones((3,), jnp.float32),
            "attn_sink": f32(H, s=0.3),
            "q_norm": ones(cfg.q_lora_rank),
            "kv_norm": ones(hd),
            "wq_a": w(cfg.q_lora_rank, D),
            "wq_b": w(H * hd, cfg.q_lora_rank),
            "wkv": w(hd, D),
            "wo_a": w(cfg.o_groups * cfg.o_lora_rank, H * hd // cfg.o_groups),
            "wo_b": w(D, cfg.o_groups * cfg.o_lora_rank),
            "gate_weight": w(cfg.n_routed_experts, D),
            "shared_w1": w(cfg.moe_inter_dim, D),
            "shared_w2": w(D, cfg.moe_inter_dim),
            "shared_w3": w(cfg.moe_inter_dim, D),
            "experts_w1": w(cfg.n_routed_experts, cfg.moe_inter_dim, D),
            "experts_w2": w(cfg.n_routed_experts, D, cfg.moe_inter_dim),
            "experts_w3": w(cfg.n_routed_experts, cfg.moe_inter_dim, D),
        }
        if li < cfg.n_hash_layers:
            lw["gate_tid2eid"] = jnp.asarray(
                rng.integers(0, cfg.n_routed_experts,
                             (cfg.vocab_size, cfg.n_activated_experts)),
                jnp.int32,
            )
        else:
            lw["gate_bias"] = f32(cfg.n_routed_experts, s=0.2)
        if ratio > 0:
            coff = 2 if ratio == 4 else 1
            lw["comp"] = {
                "ape": f32(ratio, coff * hd, s=0.3),
                "wkv": w(coff * hd, D),
                "wgate": w(coff * hd, D),
                "norm": ones(hd),
            }
        if ratio == 4:
            ihd = cfg.index_head_dim
            lw["idx_wq_b"] = w(cfg.index_n_heads * ihd, cfg.q_lora_rank)
            lw["idx_weights_proj"] = w(cfg.index_n_heads, D)
            lw["idx_comp"] = {
                "ape": f32(ratio, 2 * ihd, s=0.3),
                "wkv": w(2 * ihd, D),
                "wgate": w(2 * ihd, D),
                "norm": ones(ihd),
            }
        layers.append(lw)

    return {
        "embed": w(cfg.vocab_size, D),
        "head": w(cfg.vocab_size, D),
        "norm": ones(D),
        "hc_head_fn": f32(n, n * D, s=0.2),
        "hc_head_base": f32(n, s=0.5),
        "hc_head_scale": jnp.ones((1,), jnp.float32),
        "layers": layers,
    }


# Tensors the reference holds FP8-blocked (model.rs fp8_linear call sites)
FP8_KEYS = ("wq_a", "wq_b", "wkv", "wo_b", "shared_w1", "shared_w2",
            "shared_w3", "idx_wq_b")
# Expert stacks the reference holds FP4-grouped (moe_fp4_grouped_* kernels)
FP4_KEYS = ("experts_w1", "experts_w2", "experts_w3")


def quantize_params_resident(params: Dict[str, Any],
                             experts: str = "fp4") -> Dict[str, Any]:
    """bf16 params tree → quantized-resident tree ({"q","s"} containers on
    the reference's FP8/FP4 tensor set; everything else untouched).

    Mirrors what load_params(resident=True) produces from a real mp8
    checkpoint — used by tests/benches that start from random bf16 params.

    ``experts``: "fp4" (checkpoint-exact packed E2M1, 0.5 B/param) or
    "int8" (per-output-channel speed mode, 1 B/param streamed several×
    faster — see ops/quant.quantize_int8_stack).
    """
    assert experts in ("fp4", "int8"), experts
    out = {k: v for k, v in params.items() if k != "layers"}
    layers = []
    for lw in params["layers"]:
        nlw = dict(lw)
        for k in FP8_KEYS:
            if k in nlw:
                nlw[k] = quant.quantize_fp8_tensor(nlw[k])
        for k in FP4_KEYS:
            if k in nlw:
                nlw[k] = (quant.quantize_int8_stack(nlw[k])
                          if experts == "int8"
                          else quant.quantize_fp4_stack(nlw[k]))
        layers.append(nlw)
    out["layers"] = layers
    return out


def params_hbm_bytes(params) -> int:
    """Device bytes of a params tree (sub-byte dtypes counted at true width)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        bits = jnp.finfo(leaf.dtype).bits if jnp.issubdtype(
            leaf.dtype, jnp.floating) else jnp.iinfo(leaf.dtype).bits
        total += leaf.size * bits // 8
    return total


# ── Forward pieces ───────────────────────────────────────────────────────


def _rms(x, wt, eps):
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype) * wt


def _attn_q(cfg: DSv4Config, lw, x, positions, inv_freq, fp8=False):
    """x: [T, D] → q [T, H, hd] (rope'd)."""
    T = x.shape[0]
    qa = _rms(quant.qlinear(x, lw["wq_a"], fp8), lw["q_norm"], cfg.rms_norm_eps)
    q = quant.qlinear(qa, lw["wq_b"], fp8).reshape(
        T, cfg.num_attention_heads, cfg.head_dim
    )
    return dsa.rope_interleaved(
        q, positions[:, None], jnp.asarray(inv_freq), cfg.qk_rope_head_dim
    ), qa


def _attn_kv(cfg: DSv4Config, lw, x, positions, inv_freq, fp8=False):
    """x: [T, D] → joint kv rows [T, hd] (rope'd + fp8 storage rounding)."""
    kv = _rms(quant.qlinear(x, lw["wkv"], fp8), lw["kv_norm"], cfg.rms_norm_eps)
    kv = dsa.rope_interleaved(kv, positions, jnp.asarray(inv_freq), cfg.qk_rope_head_dim)
    return dsa.fp8_round_nope(kv, cfg.qk_rope_head_dim)


def _attn_out(cfg: DSv4Config, lw, o, fp8=False):
    """o: [T, H, hd] → [T, D] through the grouped o-LoRA."""
    T = o.shape[0]
    G = cfg.o_groups
    per_g = cfg.num_attention_heads * cfg.head_dim // G
    og = o.reshape(T, G, per_g)
    wo_a = lw["wo_a"].reshape(G, cfg.o_lora_rank, per_g)
    oa = jnp.einsum("tgp,grp->tgr", og, wo_a).reshape(T, G * cfg.o_lora_rank)
    return quant.qlinear(oa, lw["wo_b"], fp8)


def _compress_layer(cfg: DSv4Config, comp, x, ratio: int, head_dim: int,
                    inv_freq):
    """Prefill compressor: x [T, D] → (compressed [C, head_dim] (rope'd at
    group-start positions, fp8-rounded nope dims), scores, values)."""
    scores, values = dsa.compress_scores_values(x, comp["wgate"], comp["wkv"])
    if ratio == 4:
        c = dsa.compress_overlap(scores, values, comp["ape"], comp["norm"],
                                 cfg.rms_norm_eps)
    else:
        c = dsa.compress_nonoverlap(scores, values, comp["ape"], comp["norm"],
                                    ratio, cfg.rms_norm_eps)
    C = c.shape[0]
    cpos = jnp.arange(C, dtype=jnp.int32) * ratio
    c = dsa.rope_interleaved(
        c.astype(x.dtype), cpos, jnp.asarray(inv_freq), cfg.qk_rope_head_dim
    )
    return dsa.fp8_round_nope(c, cfg.qk_rope_head_dim), scores, values


def _emit_compressed_block(cfg: DSv4Config, comp, ps_rows, pv_rows, positions,
                           ratio: int, inv_freq):
    """Decode-side block emission from the pending projection rings.

    ps_rows/pv_rows: [B, R, out_dim] f32 rings (R = ratio, or 2*ratio for
    overlap); positions: [B] (the emitting token is the group's last).
    Returns [B, head_dim] rope'd + rounded compressed rows (garbage for
    non-emitting rows — caller masks via the dead column).
    """
    B = positions.shape[0]
    if ratio == 4:
        R = 8
        base_cur = ((positions - 3) % R)[:, None]  # ring idx of current group
        r = jnp.arange(4)[None, :]
        cur_idx = (base_cur + r) % R
        prev_idx = (base_cur + 4 + r) % R
        take = lambda rows, idx: jnp.take_along_axis(  # noqa: E731
            rows, idx[..., None], axis=1
        )
        has_prev = (positions + 1) // ratio > 1
        block = dsa.compress_block_overlap(
            take(ps_rows, prev_idx), take(pv_rows, prev_idx),
            take(ps_rows, cur_idx), take(pv_rows, cur_idx),
            comp["ape"], comp["norm"], cfg.rms_norm_eps, has_prev,
        )
    else:
        # ring slot of token c*ratio + r is exactly r
        block = dsa.compress_block_nonoverlap(
            ps_rows, pv_rows, comp["ape"], comp["norm"], cfg.rms_norm_eps
        )
    cpos = ((positions + 1) // ratio - 1) * ratio
    block = dsa.rope_interleaved(block, cpos, jnp.asarray(inv_freq),
                                 cfg.qk_rope_head_dim)
    return dsa.fp8_round_nope(block, cfg.qk_rope_head_dim)


_sparse_attn_parts_b = jax.vmap(
    dsa.sparse_attention_parts, in_axes=(0, 0, None, None)
)


def make_state(cfg: DSv4Config, max_slots: int, max_blocks: int,
               dtype=jnp.float32):
    """Per-slot decode caches (row max_slots is the dead slot)."""
    S = max_slots + 1
    W = cfg.sliding_window
    hd, ihd = cfg.head_dim, cfg.index_head_dim
    layers = []
    for li in range(cfg.n_layers):
        ratio = cfg.compress_ratios[li]
        ls: Dict[str, Any] = {"kv": jnp.zeros((S, W, hd), dtype)}
        if ratio > 0:
            coff = 2 if ratio == 4 else 1
            R = 8 if ratio == 4 else ratio
            ls["ckv"] = jnp.zeros((S, max_blocks + 1, hd), dtype)  # +1 dead col
            ls["ps"] = jnp.zeros((S, R, coff * hd), jnp.float32)
            ls["pv"] = jnp.zeros((S, R, coff * hd), jnp.float32)
        if ratio == 4:
            ls["ick"] = jnp.zeros((S, max_blocks + 1, ihd), dtype)
            ls["ips"] = jnp.zeros((S, 8, 2 * ihd), jnp.float32)
            ls["ipv"] = jnp.zeros((S, 8, 2 * ihd), jnp.float32)
        layers.append(ls)
    return {"layers": layers}


# ── Run modes: kernel switches + expert parallelism ─────────────────────
# The fused Pallas FP4/FP8 dequant-GEMV switches and the expert-parallel
# MoE transport are RUNTIME choices, not architecture: they live on a
# RunModes carried by the engine's ModelRuntime and threaded explicitly
# into the traced functions, so two engines with different modes coexist
# in one process (tests/test_dsv4_engine.py::test_two_engines_different_modes).
# The module-level default (set_* helpers) remains for scripts/tests that
# drive the model functions directly; ``modes=None`` falls back to it at
# trace time.


@dataclass(frozen=True)
class RunModes:
    """fp4_kernel / fp8_kernel: False | True | "interpret" — route the
    decode-shaped quantized linears through the fused Pallas dequant-GEMVs
    (ops/pallas/fp4_gemm.py; the reference's TileLang moe_fp4_grouped /
    fp8_linear analogs). moe_ep: (mesh, axis, transport) — ship
    prefill-scale routed MoE tokens via ops/moe_ep.moe_ep_a2a (the
    reference's pplx-ep all-to-all, pegainfer-comm/src/ep_backend.rs)."""
    fp4_kernel: Any = False
    fp8_kernel: Any = False
    moe_ep: Optional[tuple] = None  # (mesh, axis_name, transport)
    # dispatch/combine scratch bound: global tokens per EP a2a chunk (the
    # reference sizes rank buffers once — EpTopology.max_recv_tokens;
    # prompt-scale prefills must not inflate them)
    ep_prefill_chunk: int = 1024


_MOE_EP: Optional[tuple] = None  # module default (see RunModes note)
_FP4_KERNEL = False


def _resolve_modes(modes: Optional["RunModes"]) -> "RunModes":
    if modes is not None:
        return modes
    from pegainfer_tpu.ops import quant as _q

    return RunModes(fp4_kernel=_FP4_KERNEL, fp8_kernel=_q._FP8_KERNEL,
                    moe_ep=_MOE_EP)


def set_moe_ep(mesh, axis: str = "tp", transport: str = "ragged") -> None:
    global _MOE_EP
    _MOE_EP = (mesh, axis, transport)


def clear_moe_ep() -> None:
    global _MOE_EP
    _MOE_EP = None


def set_fp4_kernel(on) -> None:
    """on: False | True | "interpret" (CPU-test mode)."""
    global _FP4_KERNEL
    _FP4_KERNEL = on


def _fp4_kernel_ok(lw) -> bool:
    from pegainfer_tpu.ops.pallas.fp4_gemm import fp4_gemv_supported

    return all(
        quant.is_quantized(lw[k])
        and fp4_gemv_supported(lw[k]["q"], lw[k]["s"])
        for k in ("experts_w1", "experts_w2", "experts_w3")
    )


def _int8_kernel_ok(lw) -> bool:
    from pegainfer_tpu.ops.pallas.fp4_gemm import int8_gemv_supported

    return all(
        quant.is_quantized(lw[k]) and lw[k]["q"].dtype == jnp.int8
        and int8_gemv_supported(lw[k]["q"])
        for k in ("experts_w1", "experts_w2", "experts_w3")
    )


def _int8_srows(w, flat_e: jax.Array) -> jax.Array:
    """Gathered per-output-channel scales s[e(m)] → [M, OUT] f32 (the
    int8 kernels return unscaled dots — the scale commutes with the dot,
    so it is applied here at M·OUT cost instead of per weight element)."""
    s = w["s"]
    if "layer" in w:
        s = jax.lax.dynamic_index_in_dim(s, w["layer"], 0, keepdims=False)
    return s[flat_e].astype(jnp.float32)


def hash_gate(xf32, gate_weight, tid2eid, token_ids, topk_scale: float):
    """Hash-layer routing (reference deepseek_moe.cu:71-168
    deepseek_hash_gate_kernel + route_normalize): experts come from the
    token-id table; weight = sqrt(softplus(x·gw[e])), normalized by the
    row sum (0 when the sum is 0) then scaled."""
    experts = tid2eid[token_ids]  # [T, K]
    gw = gate_weight.astype(jnp.float32)
    dots = jnp.einsum("td,tkd->tk", xf32, gw[experts])
    w = jnp.sqrt(jax.nn.softplus(dots))
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    return jnp.where(wsum > 0, w / wsum, 0.0) * topk_scale, experts


def score_gate(xf32, gate_weight, gate_bias, k: int, topk_scale: float):
    """Score routing (reference deepseek_moe.cu:179-271
    deepseek_score_gate_select_kernel): score = sqrt(softplus(x·gw));
    selection on score + bias with the 'strictly greater, else lower
    index' tie contract (stable argsort); route weight is the UN-biased
    score, normalized by the selected sum then scaled."""
    raw = xf32 @ gate_weight.astype(jnp.float32).T  # [T, E]
    score = jnp.sqrt(jax.nn.softplus(raw))
    sel = score + gate_bias.astype(jnp.float32)
    order = jnp.argsort(-sel, axis=-1, stable=True)[:, :k]
    w = jnp.take_along_axis(score, order, axis=-1)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    return jnp.where(wsum > 0, w / wsum, 0.0) * topk_scale, order


def _moe(cfg: DSv4Config, lw, layer_idx: int, x, token_ids,
         modes: RunModes = RunModes()):
    """x: [T, D] → MoE output [T, D] (shared + routed experts)."""
    T = x.shape[0]
    E, K = cfg.n_routed_experts, cfg.n_activated_experts
    xf32 = x.astype(jnp.float32)

    if layer_idx < cfg.n_hash_layers:
        weights, route_idx = hash_gate(
            xf32, lw["gate_weight"], lw["gate_tid2eid"], token_ids,
            cfg.routed_scaling_factor)
    else:
        weights, route_idx = score_gate(
            xf32, lw["gate_weight"], lw["gate_bias"], K,
            cfg.routed_scaling_factor)

    def swiglu(gate, up):
        limit = cfg.swiglu_limit
        if limit > 0:
            gate = jnp.minimum(gate, limit)
            up = jnp.clip(up, -limit, limit)
        return jax.nn.sigmoid(gate) * gate * up

    # shared expert
    fp8 = modes.fp8_kernel
    g = quant.qlinear(x, lw["shared_w1"], fp8).astype(jnp.float32)
    u = quant.qlinear(x, lw["shared_w3"], fp8).astype(jnp.float32)
    shared = quant.qlinear(swiglu(g, u).astype(x.dtype), lw["shared_w2"], fp8)

    M = T * K
    flat_e = route_idx.reshape(M)
    flat_t = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
    flat_w = weights.reshape(M)
    if T >= 8:
        # prefill scale: sort token-slots by expert and run grouped GEMMs
        # (lax.ragged_dot_general — XLA's MoE group-GEMM primitive; the
        # reference's analog is its grouped expert GEMM kernels,
        # deepseek_quant.cu moe_fp4_grouped_w13). O(T·K·I·D) instead of the
        # dense O(T·E·I·D) one-hot combine. Quantized-resident experts are
        # dequantized layer-wide here (amortized over the prefill tokens; a
        # Pallas fused dequant-group-GEMM is the staged upgrade).
        def w_f32(w):
            return (quant.dequant_any(w, jnp.float32)
                    if quant.is_quantized(w) else w.astype(jnp.float32))

        if modes.moe_ep is not None:
            # expert-parallel token shipping: dispatch rows to their
            # experts' shards and combine back (4-step a2a, moe_ep.py)
            from pegainfer_tpu.ops import moe_ep as ep

            mesh, axis, transport = modes.moe_ep
            n = mesh.shape[axis]
            Tp = -(-T // n) * n
            pad = Tp - T
            routed = ep.moe_ep_a2a_chunked(
                mesh,
                jnp.pad(xf32, ((0, pad), (0, 0))),
                w_f32(lw["experts_w1"]), w_f32(lw["experts_w2"]),
                w_f32(lw["experts_w3"]),
                jnp.pad(route_idx, ((0, pad), (0, 0))),  # pad → expert 0
                jnp.pad(weights, ((0, pad), (0, 0))),  # pad weight 0
                cfg.swiglu_limit, axis=axis, transport=transport,
                chunk_tokens=modes.ep_prefill_chunk,
            )[:T]
            return (routed + shared.astype(jnp.float32)).astype(x.dtype)

        order = jnp.argsort(flat_e)
        src_t = flat_t[order]

        if modes.fp4_kernel and _int8_kernel_ok(lw):
            # int8 grouped GEMM (speed mode — see the decode branch note):
            # unscaled per-segment dots, scales gathered per sorted row
            from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

            interp = modes.fp4_kernel == "interpret"
            e_sorted = flat_e[order]
            tm = 128 if M >= 128 else -(-M // 8) * 8
            Mp = -(-M // tm) * tm
            xs = jnp.pad(x.astype(jnp.bfloat16)[src_t], ((0, Mp - M), (0, 0)))
            e_pad = jnp.pad(e_sorted, (0, Mp - M), mode="edge")
            seg = pfp4.tile_segments(e_pad, tm, E)

            def grouped8(xrows, w):
                y = pfp4.moe_int8_grouped(
                    xrows, w["q"], *seg, tm=tm, interpret=interp,
                    layer=w.get("layer"))
                return y * _int8_srows(w, e_pad)

            ge = grouped8(xs, lw["experts_w1"])
            ue = grouped8(xs, lw["experts_w3"])
            act = swiglu(ge, ue)  # [Mp, I] f32
            per = grouped8(act.astype(jnp.bfloat16), lw["experts_w2"])[:M]
        elif modes.fp4_kernel and _fp4_kernel_ok(lw):
            # fused fp4 grouped GEMM (Pallas): weights stream PACKED, no
            # bf16 expert-stack materialization — the XLA dequant form
            # below needs 12.9 GB/layer at the real 256-expert geometry
            # (measured OOM; reference analog deepseek_quant.cu
            # moe_fp4_grouped_w13/w2). Exact at any routing skew: per-tile
            # expert segments, no capacity factor.
            from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

            interp = modes.fp4_kernel == "interpret"
            e_sorted = flat_e[order]
            tm = 128 if M >= 128 else -(-M // 8) * 8
            Mp = -(-M // tm) * tm
            xs = jnp.pad(x.astype(jnp.bfloat16)[src_t], ((0, Mp - M), (0, 0)))
            # pad rows carry the LAST expert id (keeps segments sorted and
            # DMA indices in range); their outputs are sliced off
            e_pad = jnp.pad(e_sorted, (0, Mp - M), mode="edge")
            seg = pfp4.tile_segments(e_pad, tm, E)

            def grouped(xrows, w):
                return pfp4.moe_fp4_grouped(
                    xrows, w["q"], w["s"], *seg, tm=tm, interpret=interp,
                    layer=w.get("layer"))

            ge = grouped(xs, lw["experts_w1"])
            ue = grouped(xs, lw["experts_w3"])
            act = swiglu(ge, ue)  # [Mp, I] f32
            per = grouped(act.astype(jnp.bfloat16), lw["experts_w2"])[:M]
        else:
            group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
            dn = lax.RaggedDotDimensionNumbers(
                dot_dimension_numbers=(((1,), (2,)), ((), ())),
                lhs_ragged_dimensions=[0],
                rhs_group_dimensions=[0],
            )
            int8_exp = (quant.is_quantized(lw["experts_w1"])
                        and lw["experts_w1"]["q"].dtype == jnp.int8)

            # bf16 dequant (exact: E2M1/E4M3 values x pow2 scales are bf16-
            # representable) — an f32 materialization of the full expert
            # stacks doubles the per-layer HBM bytes at real 256-expert
            # scale. int8 containers: cast the raw int8 (exact in bf16) and
            # apply the f32 per-output scale AFTER the dot — the kernel
            # path's scale-after-dot numerics.
            def w_bf16(w):
                if quant.is_quantized(w):
                    if w["q"].dtype == jnp.int8:
                        q = w["q"]
                        if "layer" in w:
                            q = jax.lax.dynamic_index_in_dim(
                                q, w["layer"], 0, keepdims=False)
                        return q.astype(jnp.bfloat16)
                    return quant.dequant_any(w, jnp.bfloat16)
                return w.astype(jnp.bfloat16)

            def post(y, w):
                return y * _int8_srows(w, flat_e[order]) if int8_exp else y

            xs = x.astype(jnp.bfloat16)[src_t]  # [M, D] in expert order
            ge = post(lax.ragged_dot_general(
                xs, w_bf16(lw["experts_w1"]), group_sizes, dn,
                preferred_element_type=jnp.float32), lw["experts_w1"])
            ue = post(lax.ragged_dot_general(
                xs, w_bf16(lw["experts_w3"]), group_sizes, dn,
                preferred_element_type=jnp.float32), lw["experts_w3"])
            act = swiglu(ge, ue)  # [M, I] f32
            per = post(lax.ragged_dot_general(
                act.astype(jnp.bfloat16), w_bf16(lw["experts_w2"]),
                group_sizes, dn, preferred_element_type=jnp.float32),
                lw["experts_w2"])
        per = per * flat_w[order][:, None]
        routed = jnp.zeros((T, x.shape[1]), jnp.float32).at[src_t].add(per)
    else:
        # decode scale: gather ONLY the routed experts' weights — bytes and
        # FLOPs ∝ T·K, not E (at the real model's 256 experts the dense
        # combine would stream every expert per token; reference analog:
        # moe_local_mapping route compaction, deepseek_moe.cu).
        xs = xf32[flat_t]  # [M, D]
        if modes.fp4_kernel and _int8_kernel_ok(lw):
            # int8 speed mode: the kernel streams int8 bytes with one hw
            # convert per element (no per-element scale ops — the fp4
            # GEMV's measured VPU roof); scales apply to the [M, OUT]
            # results here
            from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

            interp = modes.fp4_kernel == "interpret"
            w1c = lw["experts_w1"]
            w3c = lw["experts_w3"]
            w2c = lw["experts_w2"]
            if (pfp4.int8_chain_supported(w1c, w2c, int(flat_e.shape[0]))
                    and os.environ.get("PEGAINFER_DSV4_CHAIN", "1") != "0"):
                # fused whole-chain kernel: ONE pallas call per layer
                # (w1 ‖ w3 → scales → clamped SwiGLU → w2 → scales)
                # instead of three + the XLA swiglu (round-5 study)
                per = pfp4.moe_int8_chain(
                    xs, w1c["q"], w3c["q"], w2c["q"],
                    w1c["s"], w3c["s"], w2c["s"], flat_e,
                    limit=cfg.swiglu_limit, interpret=interp,
                    layer=w1c.get("layer"))
            else:
                def gemv8(xrows, w):
                    y = pfp4.moe_int8_gemv(
                        xrows, w["q"], flat_e, interpret=interp,
                        layer=w.get("layer"))
                    return y * _int8_srows(w, flat_e)

                ge = gemv8(xs, lw["experts_w1"])
                ue = gemv8(xs, lw["experts_w3"])
                act = swiglu(ge, ue)  # [M, I] f32
                per = gemv8(act, lw["experts_w2"])
        elif modes.fp4_kernel and _fp4_kernel_ok(lw):
            # fused dequant-GEMV: weight bytes stream as packed fp4
            from pegainfer_tpu.ops.pallas import fp4_gemm as pfp4

            interp = modes.fp4_kernel == "interpret"
            w1c = lw["experts_w1"]
            w3c = lw["experts_w3"]
            w2c = lw["experts_w2"]
            if (pfp4.fp4_chain_supported(w1c, w2c, int(flat_e.shape[0]))
                    and os.environ.get("PEGAINFER_DSV4_CHAIN", "") == "1"):
                # fused whole-chain kernel (packed end to end, in-kernel
                # activation parity split). OPT-IN for fp4: measured 5.61
                # vs 5.27 ms at the scaled config — the per-tile dequant
                # work (SWAR + scale expansion + parity split) outweighs
                # the saved call overheads, unlike the int8 chain whose
                # per-tile work is one convert (docs/PERF.md round 5).
                # p95/delivery improve (6.23 vs 8.10), hence kept opt-in.
                per = pfp4.moe_fp4_chain(
                    xs, w1c["q"], w1c["s"], w3c["q"], w3c["s"],
                    w2c["q"], w2c["s"], flat_e,
                    limit=cfg.swiglu_limit, interpret=interp,
                    layer=w1c.get("layer"))
            else:
                def gemv(xrows, w):
                    return pfp4.moe_fp4_gemv(
                        xrows, w["q"], w["s"], flat_e, interpret=interp,
                        layer=w.get("layer"))

                ge = gemv(xs, lw["experts_w1"])
                ue = gemv(xs, lw["experts_w3"])
                act = swiglu(ge, ue)  # [M, I] f32
                per = gemv(act, lw["experts_w2"])
        elif (quant.is_quantized(lw["experts_w1"])
              and lw["experts_w1"]["q"].dtype == jnp.int8):
            # int8 XLA fallback: gather the int8 rows (exact in bf16 —
            # integers ≤ 127), dot, then the f32 per-output scale — the
            # same scale-after-dot numerics as the Pallas kernel path
            def gd8(w):
                q = w["q"]
                if "layer" in w:
                    q = jax.lax.dynamic_index_in_dim(
                        q, w["layer"], 0, keepdims=False)
                return q[flat_e].astype(jnp.bfloat16)

            xb = xs.astype(jnp.bfloat16)
            ge = jnp.einsum("md,mid->mi", xb, gd8(lw["experts_w1"]),
                            preferred_element_type=jnp.float32
                            ) * _int8_srows(lw["experts_w1"], flat_e)
            ue = jnp.einsum("md,mid->mi", xb, gd8(lw["experts_w3"]),
                            preferred_element_type=jnp.float32
                            ) * _int8_srows(lw["experts_w3"], flat_e)
            act = swiglu(ge, ue)
            per = jnp.einsum("mi,mdi->md", act.astype(jnp.bfloat16),
                             gd8(lw["experts_w2"]),
                             preferred_element_type=jnp.float32
                             ) * _int8_srows(lw["experts_w2"], flat_e)
        else:
            # XLA fallback: bf16 gathers (exact — E2M1 x pow2 values are
            # bf16-representable; f32 would double the materialized bytes)
            w1g = quant.gather_dequant(lw["experts_w1"], flat_e,
                                       jnp.bfloat16)  # [M, I, D]
            w3g = quant.gather_dequant(lw["experts_w3"], flat_e,
                                       jnp.bfloat16)
            xb = xs.astype(jnp.bfloat16)
            ge = jnp.einsum("md,mid->mi", xb, w1g,
                            preferred_element_type=jnp.float32)
            ue = jnp.einsum("md,mid->mi", xb, w3g,
                            preferred_element_type=jnp.float32)
            act = swiglu(ge, ue)  # [M, I]
            w2g = quant.gather_dequant(lw["experts_w2"], flat_e,
                                       jnp.bfloat16)  # [M, D, I]
            per = jnp.einsum("mi,mdi->md", act.astype(jnp.bfloat16), w2g,
                             preferred_element_type=jnp.float32)
        per = per * flat_w[:, None]
        routed = jnp.zeros((T, x.shape[1]), jnp.float32).at[flat_t].add(per)

    return (routed + shared.astype(jnp.float32)).astype(x.dtype)


# ── Prefill ──────────────────────────────────────────────────────────────


def prefill(cfg: DSv4Config, params, tokens, state=None, slot=None,
            seq_len=None, modes: Optional[RunModes] = None):
    """Prefill over one (optionally right-padded) prompt. Returns
    (logits [T, V] f32, caches | state').

    ``seq_len`` (default T) is the real token count: queries past it emit
    garbage rows that are never consumed (causal index masks bound every
    lookup by the query position), and the state seeding slices the last
    valid rows dynamically — so bucket-padded prompts are safe.

    Without ``state``: returns per-layer cache dicts (inspection/tests).
    With ``state`` + ``slot``: seeds that slot's decode caches (kv ring,
    compressed rows, pending projection rings) and returns the new state.
    """
    T = tokens.shape[0]
    if seq_len is None:
        seq_len = T
    modes = _resolve_modes(modes)
    positions = jnp.arange(T, dtype=jnp.int32)
    x = params["embed"][tokens]
    streams = hc.hc_expand(x, cfg.hc_mult)
    caches: List[Dict[str, Any]] = []

    for li, lw in enumerate(params["layers"]):
        streams, cache = _prefill_layer(
            cfg, lw, streams, tokens, positions,
            cfg.compress_ratios[li], li < cfg.n_hash_layers,
            cfg.rope_inv_freq(li), modes,
        )
        caches.append(cache)

    logits = _head_logits(cfg, params, streams)
    if state is None:
        return logits, caches
    return logits, _seed_state(cfg, state, caches, seq_len, slot)


def _prefill_layer(cfg: DSv4Config, lw, streams, tokens, positions,
                   ratio: int, is_hash: bool, inv_freq,
                   modes: RunModes = RunModes()):
    """One prefill layer; returns (streams, cache dict). Shared by the
    unrolled path and prefill_grouped."""
    T = tokens.shape[0]
    if True:
        # attention branch
        mixes = hc.hc_mixes(streams, lw["hc_attn_fn"], cfg.rms_norm_eps)
        pre, post, comb = hc.hc_split_sinkhorn(
            mixes, lw["hc_attn_scale"], lw["hc_attn_base"], cfg.hc_mult,
            cfg.hc_sinkhorn_iters, cfg.hc_eps,
        )
        h_in = hc.hc_pre(streams, pre)
        h_norm = _rms(h_in, lw["attn_norm"], cfg.rms_norm_eps)

        q, qa = _attn_q(cfg, lw, h_norm, positions, inv_freq,
                        modes.fp8_kernel)
        kv = _attn_kv(cfg, lw, h_norm, positions, inv_freq,
                      modes.fp8_kernel)

        cache: Dict[str, Any] = {"kv": kv, "ckv": None, "ick": None}
        win_idx = dsa.window_indices(T, cfg.sliding_window)
        # window part: per-query gather of W own-kv rows (small; the
        # compressed parts below avoid per-query gathers entirely)
        win_part = (kv[jnp.maximum(win_idx, 0)], win_idx >= 0)
        if ratio == 0:
            parts = [win_part]
        else:
            ckv, c_s, c_v = _compress_layer(
                cfg, lw["comp"], h_norm, ratio, cfg.head_dim, inv_freq
            )
            cache["ckv"] = ckv
            cache["comp_sv"] = (c_s, c_v)
            C = ckv.shape[0]
            if ratio == 4:
                ihd = cfg.index_head_dim
                iq = quant.qlinear(qa, lw["idx_wq_b"],
                                   modes.fp8_kernel).reshape(
                    T, cfg.index_n_heads, ihd
                )
                iq = dsa.rope_interleaved(
                    iq, positions[:, None], jnp.asarray(inv_freq), cfg.qk_rope_head_dim
                )
                ick, i_s, i_v = _compress_layer(
                    cfg, lw["idx_comp"], h_norm, ratio, ihd, inv_freq
                )
                cache["ick"] = ick
                cache["idx_sv"] = (i_s, i_v)
                iw = h_norm @ lw["idx_weights_proj"].T  # [T, idx_heads]
                score_scale = 1.0 / math.sqrt(ihd) / math.sqrt(cfg.index_n_heads)
                scores = dsa.indexer_scores(iq, ick, iw, score_scale)
                valid = (positions + 1) // ratio
                # SHARED-part form: dense MXU scores over the compressed
                # cache with a top-k MEMBERSHIP mask — no [T, K, d] gather
                # materialization and no ordered-index argsort (softmax is
                # permutation-invariant; tie contract pinned by topk_mask
                # tests). The measured ratio-4 prefill premium was exactly
                # this gather (docs/PERF.md round 4).
                sel = dsa.topk_mask(scores, cfg.index_topk, valid)
                parts = [win_part, (ckv, sel)]
            else:
                # nonoverlap: causal prefix of compressed rows — dense over
                # the cache with the causal mask, same shared-part form
                valid = (positions + 1) // ratio
                sel = jnp.arange(C)[None, :] < valid[:, None]
                parts = [win_part, (ckv, sel)]

        o = dsa.sparse_attention_parts(
            q, parts, lw["attn_sink"], cfg.head_dim ** -0.5
        )
        attn_out = _attn_out(cfg, lw, o, modes.fp8_kernel)
        streams = hc.hc_post(attn_out, streams, post, comb)

        # ffn branch
        mixes = hc.hc_mixes(streams, lw["hc_ffn_fn"], cfg.rms_norm_eps)
        pre, post, comb = hc.hc_split_sinkhorn(
            mixes, lw["hc_ffn_scale"], lw["hc_ffn_base"], cfg.hc_mult,
            cfg.hc_sinkhorn_iters, cfg.hc_eps,
        )
        f_in = hc.hc_pre(streams, pre)
        f_norm = _rms(f_in, lw["ffn_norm"], cfg.rms_norm_eps)
        ffn_out = _moe(cfg, lw, 0 if is_hash else cfg.n_hash_layers,
                       f_norm, tokens, modes)
        streams = hc.hc_post(ffn_out, streams, post, comb)
    return streams, cache


def _ring_seed(dst, slot, src, seq_len, R: int):
    """Fill dst[slot] (a [R, d] ring keyed by position % R) from src
    ([T, d]): ring slot r gets the LAST position p < seq_len with
    p % R == r (unwritten slots belong to future positions and are
    rewritten by decode before any read)."""
    r = jnp.arange(R, dtype=jnp.int32)
    p = seq_len - 1 - ((seq_len - 1 - r) % R)
    valid = p >= 0
    rows = src[jnp.maximum(p, 0)].astype(dst.dtype)
    ring = jnp.where(valid[:, None], rows, dst[slot, r])
    return dst.at[slot, r].set(ring)


def _seed_state(cfg: DSv4Config, state, caches, seq_len, slot,
                layer_override=None):
    """Write a prefilled request's caches into its decode slot.

    seq_len may be traced (padded prefill): ring seeds slice the last valid
    rows dynamically; compressed rows past seq_len//ratio are garbage but
    never referenced (decode bounds lookups by position) and the partial
    group re-emits over them. ``layer_override``: treat the single cache
    entry as that global layer index (grouped seeding).
    """
    W = cfg.sliding_window
    seq_len = jnp.asarray(seq_len, jnp.int32)
    new_layers = []
    for li, cache in enumerate(caches):
        ratio = cfg.compress_ratios[li if layer_override is None else layer_override]
        ls = dict(state["layers"][li])
        ls["kv"] = _ring_seed(ls["kv"], slot, cache["kv"], seq_len, W)
        if ratio > 0:
            R = 8 if ratio == 4 else ratio
            ckv = cache["ckv"]
            C = min(ckv.shape[0], ls["ckv"].shape[1] - 1)
            ls["ckv"] = ls["ckv"].at[slot, :C].set(ckv[:C].astype(ls["ckv"].dtype))
            c_s, c_v = cache["comp_sv"]
            ls["ps"] = _ring_seed(ls["ps"], slot, c_s, seq_len, R)
            ls["pv"] = _ring_seed(ls["pv"], slot, c_v, seq_len, R)
        if ratio == 4:
            ick = cache["ick"]
            Ci = min(ick.shape[0], ls["ick"].shape[1] - 1)
            ls["ick"] = ls["ick"].at[slot, :Ci].set(ick[:Ci].astype(ls["ick"].dtype))
            i_s, i_v = cache["idx_sv"]
            ls["ips"] = _ring_seed(ls["ips"], slot, i_s, seq_len, 8)
            ls["ipv"] = _ring_seed(ls["ipv"], slot, i_v, seq_len, 8)
        new_layers.append(ls)
    return {"layers": new_layers}


# ── Decode ───────────────────────────────────────────────────────────────


def _decode_layer(cfg: DSv4Config, lw, ls, streams, tokens, positions, slots,
                  ratio: int, is_hash: bool, inv_freq,
                  modes: RunModes = RunModes()):
    """One decode layer (attention + MoE branches). ``ls`` is this layer's
    slot-cache dict, returned updated. Shared by the unrolled path and the
    segment-scanned path (decode_grouped)."""
    B = tokens.shape[0]
    W = cfg.sliding_window
    ls = dict(ls)
    if True:
        mixes = hc.hc_mixes(streams, lw["hc_attn_fn"], cfg.rms_norm_eps)
        pre, post, comb = hc.hc_split_sinkhorn(
            mixes, lw["hc_attn_scale"], lw["hc_attn_base"], cfg.hc_mult,
            cfg.hc_sinkhorn_iters, cfg.hc_eps,
        )
        h_norm = _rms(hc.hc_pre(streams, pre), lw["attn_norm"], cfg.rms_norm_eps)

        q, qa = _attn_q(cfg, lw, h_norm, positions, inv_freq,
                        modes.fp8_kernel)  # [B, H, hd]
        kv_new = _attn_kv(cfg, lw, h_norm, positions, inv_freq,
                          modes.fp8_kernel)  # [B, hd]
        ls["kv"] = ls["kv"].at[slots, positions % W].set(
            kv_new.astype(ls["kv"].dtype)
        )

        # window part: attend the ring buffer itself (ring slot r is valid
        # iff r <= pos — pos >= W means every slot holds a live token).
        # Order differs from window_ring_indices_decode's rotation but the
        # softmax is order-invariant; dsa.sparse_attention_parts regroups
        # the same logits exactly.
        win_rows = ls["kv"][slots]  # [B, W, hd]
        win_valid = jnp.arange(W, dtype=jnp.int32)[None, :] <= positions[:, None]
        if ratio == 0:
            parts = [(win_rows, win_valid)]
        else:
            R = 8 if ratio == 4 else ratio
            comp = lw["comp"]
            s_new, v_new = dsa.compress_scores_values(
                h_norm, comp["wgate"], comp["wkv"]
            )
            ls["ps"] = ls["ps"].at[slots, positions % R].set(s_new)
            ls["pv"] = ls["pv"].at[slots, positions % R].set(v_new)
            n_blocks = (positions + 1) // ratio  # [B] valid compressed count
            emit = (positions + 1) % ratio == 0
            max_blocks = ls["ckv"].shape[1] - 1
            c_idx = jnp.where(emit, jnp.minimum(n_blocks - 1, max_blocks - 1),
                              max_blocks)
            block = _emit_compressed_block(
                cfg, comp, ls["ps"][slots], ls["pv"][slots], positions, ratio,
                inv_freq,
            )
            ls["ckv"] = ls["ckv"].at[slots, c_idx].set(
                block.astype(ls["ckv"].dtype)
            )
            if ratio == 4:
                icomp = lw["idx_comp"]
                is_new, iv_new = dsa.compress_scores_values(
                    h_norm, icomp["wgate"], icomp["wkv"]
                )
                ls["ips"] = ls["ips"].at[slots, positions % 8].set(is_new)
                ls["ipv"] = ls["ipv"].at[slots, positions % 8].set(iv_new)
                iblock = _emit_compressed_block(
                    cfg, icomp, ls["ips"][slots], ls["ipv"][slots], positions,
                    ratio, inv_freq,
                )
                ls["ick"] = ls["ick"].at[slots, c_idx].set(
                    iblock.astype(ls["ick"].dtype)
                )
                ihd = cfg.index_head_dim
                iq = quant.qlinear(qa, lw["idx_wq_b"],
                                   modes.fp8_kernel).reshape(
                    B, cfg.index_n_heads, ihd
                )
                iq = dsa.rope_interleaved(
                    iq, positions[:, None], jnp.asarray(inv_freq),
                    cfg.qk_rope_head_dim,
                )
                iw = h_norm @ lw["idx_weights_proj"].T
                score_scale = 1.0 / math.sqrt(ihd) / math.sqrt(cfg.index_n_heads)
                ick_rows = ls["ick"][slots, :max_blocks]  # [B, C, ihd]
                dots = jnp.einsum(
                    "bhd,bcd->bhc", iq.astype(jnp.float32),
                    ick_rows.astype(jnp.float32),
                )
                scores = jnp.einsum(
                    "bh,bhc->bc", iw.astype(jnp.float32),
                    jnp.maximum(dots, 0.0),
                ) * score_scale
                # gather ONLY the top-k compressed rows ([B, k, hd]) —
                # never the [B, capacity, hd] cache slab (invalid picks
                # read the dead column, masked out of the softmax)
                top_ids, top_valid = dsa.topk_select(
                    scores, cfg.index_topk, n_blocks
                )
                safe_ids = jnp.where(top_valid, top_ids, max_blocks)
                top_rows = ls["ckv"][slots[:, None], safe_ids]  # [B, k, hd]
                parts = [(win_rows, win_valid), (top_rows, top_valid)]
            else:
                # non-indexer compressed layers attend every valid block
                cand = jnp.arange(max_blocks, dtype=jnp.int32)[None, :]
                crows = ls["ckv"][slots, :max_blocks]
                parts = [(win_rows, win_valid), (crows, cand < n_blocks[:, None])]

        # per-sample T=1 query axis (vmap strips the batch axis)
        parts = [(r[:, None], v[:, None]) for r, v in parts]
        o = _sparse_attn_parts_b(
            q[:, None], parts, lw["attn_sink"], cfg.head_dim ** -0.5
        )[:, 0]
        attn_out = _attn_out(cfg, lw, o, modes.fp8_kernel)
        streams = hc.hc_post(attn_out, streams, post, comb)

        mixes = hc.hc_mixes(streams, lw["hc_ffn_fn"], cfg.rms_norm_eps)
        pre, post, comb = hc.hc_split_sinkhorn(
            mixes, lw["hc_ffn_scale"], lw["hc_ffn_base"], cfg.hc_mult,
            cfg.hc_sinkhorn_iters, cfg.hc_eps,
        )
        f_norm = _rms(hc.hc_pre(streams, pre), lw["ffn_norm"], cfg.rms_norm_eps)
        ffn_out = _moe(cfg, lw, 0 if is_hash else cfg.n_hash_layers,
                       f_norm, tokens, modes)
        streams = hc.hc_post(ffn_out, streams, post, comb)
    return streams, ls


def _head_logits(cfg: DSv4Config, params, streams):
    mixes = hc.hc_mixes(streams, params["hc_head_fn"], cfg.rms_norm_eps)
    pre = hc.hc_head_pre(mixes, params["hc_head_scale"], params["hc_head_base"],
                         cfg.hc_mult, cfg.hc_eps)
    xf = _rms(hc.hc_pre(streams, pre), params["norm"], cfg.rms_norm_eps)
    return (xf @ params["head"].T).astype(jnp.float32)


def decode(cfg: DSv4Config, params, state, tokens, positions, slots,
           modes: Optional[RunModes] = None):
    """One decode step for a batch. tokens/positions/slots: [B] int32
    (padding rows: slot = dead row, position 0). Returns (state, logits)."""
    modes = _resolve_modes(modes)
    x = params["embed"][tokens]
    streams = hc.hc_expand(x, cfg.hc_mult)
    new_layers = []
    for li, lw in enumerate(params["layers"]):
        streams, ls = _decode_layer(
            cfg, lw, state["layers"][li], streams, tokens, positions, slots,
            cfg.compress_ratios[li], li < cfg.n_hash_layers,
            cfg.rope_inv_freq(li), modes,
        )
        new_layers.append(ls)
    return {"layers": new_layers}, _head_logits(cfg, params, streams)


# ── Segment grouping: scan over runs of same-signature layers ────────────
# A 43-layer unrolled trace compiles slowly; consecutive layers sharing
# (compress-ratio, gate-kind) stack their weights and slot caches on a
# leading axis and run under one lax.scan (the qwen3/qwen35 stacking trick,
# applied per run since DSv4 layers are heterogeneous).


def segments(cfg: DSv4Config):
    """[(start, end_exclusive, ratio, is_hash)] for maximal same-sig runs."""
    out = []
    start = 0
    def sig(i):
        return (cfg.compress_ratios[i], i < cfg.n_hash_layers)
    for i in range(1, cfg.n_layers + 1):
        if i == cfg.n_layers or sig(i) != sig(start):
            out.append((start, i, *sig(start)))
            start = i
    return out


def _stack_trees(trees):
    """Stack a list of identical-structure dict trees on a new leading axis."""
    def rec(items):
        if isinstance(items[0], dict):
            return {k: rec([t[k] for t in items]) for k in items[0]}
        return jnp.stack(items)
    return rec(trees)


def group_params(cfg: DSv4Config, params):
    """Per-layer param list → {"segments": [stacked trees]}. Top-level
    tensors pass through."""
    segs = []
    for (a, b, ratio, is_hash) in segments(cfg):
        segs.append(_stack_trees(params["layers"][a:b]))
    return {**{k: v for k, v in params.items() if k != "layers"},
            "segments": segs}


def group_state(cfg: DSv4Config, state):
    return {"segments": [
        _stack_trees(state["layers"][a:b]) for (a, b, _, _) in segments(cfg)
    ]}


def ungroup_state(cfg: DSv4Config, gstate):
    layers = []
    for seg_state, (a, b, _, _) in zip(gstate["segments"], segments(cfg)):
        for j in range(b - a):
            layers.append(jax.tree.map(lambda x: x[j], seg_state))
    return {"layers": layers}


def slot_export(gstate, slot):
    """One slot's decode-cache rows across all layers/segments — the whole
    PD-handoff payload for DSv4 (no paged KV: the window ring + compressed
    rows + running compressor stats ARE the request's attention state;
    reference design doc: prefix-paged-kv-pd-handoff.md). Every grouped
    leaf is [n_layers_seg, S, ...] with slot axis 1."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, slot, axis=1, keepdims=False),
        gstate,
    )


def slot_import(gstate, snap, slot):
    """Seed ``slot`` from an exported snapshot (in-place dus on donated
    buffers)."""
    def put(full, one):
        return jax.lax.dynamic_update_slice_in_dim(
            full, one[:, None].astype(full.dtype), slot, axis=1
        )

    return jax.tree.map(put, gstate, snap)



def _strip_containers(seg_params):
    """Split a stacked segment tree into (xs_tree, view_fn).

    Quantized {"q","s"} containers are REMOVED from the scan xs (their
    slot keeps a None placeholder so the tree structure survives scan
    slicing) and re-enter the per-layer weight dict as LAYER VIEWS
    {"q": stacked, "s": stacked, "layer": li}: the Pallas kernels index
    the layer through a prefetched scalar and the XLA fallbacks slice in
    dequant_any. Feeding a container through scan xs forces XLA to
    materialize a contiguous copy of the layer's packed stack EVERY step
    (measured 4.0 → 29.9 ms/step at flagship L=2 — the docs/PERF.md
    KV-pool rule applied to weights)."""
    caps = {}

    def strip(node, path):
        if isinstance(node, dict):
            if quant.is_quantized(node):
                caps[path] = node
                return None
            return {k: strip(v, path + (k,)) for k, v in node.items()}
        return node

    xs = strip(seg_params, ())

    def view(xs_slice, li):
        def rec(node, path):
            if path in caps:
                c = caps[path]
                return {"q": c["q"], "s": c["s"], "layer": li}
            if isinstance(node, dict):
                return {k: rec(v, path + (k,)) for k, v in node.items()}
            return node

        return rec(xs_slice, ())

    return xs, view


def prefill_grouped(cfg: DSv4Config, gparams, tokens, gstate=None, slot=None,
                    seq_len=None, modes: Optional[RunModes] = None):
    """prefill() over segment-scanned layers; with gstate+slot, seeds the
    slot's grouped decode caches."""
    T = tokens.shape[0]
    if seq_len is None:
        seq_len = T
    modes = _resolve_modes(modes)
    positions = jnp.arange(T, dtype=jnp.int32)
    x = gparams["embed"][tokens]
    streams = hc.hc_expand(x, cfg.hc_mult)
    seg_caches = []
    for seg_idx, (a, b, ratio, is_hash) in enumerate(segments(cfg)):
        inv_freq = cfg.rope_inv_freq(a)
        xs_p, view = _strip_containers(gparams["segments"][seg_idx])

        def body(carry, xs, view=view):
            li, lw_s = xs
            carry, cache = _prefill_layer(
                cfg, view(lw_s, li), carry, tokens, positions, ratio,
                is_hash, inv_freq, modes,
            )
            return carry, cache

        streams, caches = jax.lax.scan(
            body, streams,
            (jnp.arange(b - a, dtype=jnp.int32), xs_p))
        seg_caches.append(caches)

    logits = _head_logits(cfg, gparams, streams)
    if gstate is None:
        return logits, seg_caches
    new_segs = []
    for seg_state, caches, (a, b, ratio, _) in zip(
        gstate["segments"], seg_caches, segments(cfg)
    ):
        for j in range(b - a):  # per-layer seed within the segment
            cache_j = jax.tree.map(lambda v: v[j], caches)
            layer_state = jax.tree.map(lambda v: v[j], seg_state)
            seeded = _seed_state(
                cfg, {"layers": [layer_state]},
                [{**{"kv": None, "ckv": None, "ick": None}, **cache_j}],
                seq_len, slot, layer_override=a + j,
            )["layers"][0]
            seg_state = jax.tree.map(
                lambda full, one: full.at[j].set(one), seg_state, seeded
            )
        new_segs.append(seg_state)
    return logits, {"segments": new_segs}


def prefill_resume_grouped(cfg: DSv4Config, gparams, gstate, tokens,
                           start_pos, valid, slot, dead_slot: int,
                           modes: Optional[RunModes] = None):
    """Continue a prompt from a cached prefix snapshot (slot prefix cache,
    docs/prefix-cache-design.md): feed ``tokens`` [Sc] (right-padded,
    ``valid`` real) one at a time through the decode recurrence for
    ``slot``, starting at absolute position ``start_pos``. DSv4 state is
    position-dependent (window ring + running compressor stats), so a
    suffix continuation is exactly a sequence of decode steps — proven
    token-exact by the PD-handoff path (tests/test_pd_handoff.py).

    Padding steps (i >= valid) route their writes to ``dead_slot`` (the
    state's extra row, make_state) so the live slot is untouched. One
    lax.scan = one dispatch for the whole suffix (the per-step host
    dispatch overhead would otherwise dominate short suffixes).

    Returns (gstate, last_valid_logits [V] f32).
    """
    Sc = tokens.shape[0]
    start_pos = jnp.asarray(start_pos, jnp.int32)
    valid = jnp.asarray(valid, jnp.int32)
    slot = jnp.asarray(slot, jnp.int32)

    def body(carry, i):
        gs, last = carry
        live = i < valid
        s = jnp.where(live, slot, jnp.int32(dead_slot))[None]
        pos = (start_pos + i)[None]
        gs, logits = decode_grouped(cfg, gparams, gs, tokens[i][None], pos, s,
                                    modes)
        last = jnp.where(live, logits[0], last)
        return (gs, last), None

    init_last = jnp.zeros((cfg.vocab_size,), jnp.float32)
    (gstate, last), _ = jax.lax.scan(
        body, (gstate, init_last), jnp.arange(Sc, dtype=jnp.int32)
    )
    return gstate, last


def decode_grouped(cfg: DSv4Config, gparams, gstate, tokens, positions, slots,
                   modes: Optional[RunModes] = None):
    """decode() over segment-scanned layers — identical math, one traced
    layer body per segment instead of per layer."""
    modes = _resolve_modes(modes)
    x = gparams["embed"][tokens]
    streams = hc.hc_expand(x, cfg.hc_mult)
    new_segs = []
    for seg_idx, (a, b, ratio, is_hash) in enumerate(segments(cfg)):
        inv_freq = cfg.rope_inv_freq(a)
        xs_p, view = _strip_containers(gparams["segments"][seg_idx])

        def body(carry, xs, view=view):
            li, lw_s, ls = xs
            carry, ls_new = _decode_layer(
                cfg, view(lw_s, li), ls, carry, tokens, positions, slots,
                ratio, is_hash, inv_freq, modes,
            )
            return carry, ls_new

        streams, seg_state_new = jax.lax.scan(
            body, streams,
            (jnp.arange(b - a, dtype=jnp.int32), xs_p,
             gstate["segments"][seg_idx])
        )
        new_segs.append(seg_state_new)
    return {"segments": new_segs}, _head_logits(cfg, gparams, streams)
