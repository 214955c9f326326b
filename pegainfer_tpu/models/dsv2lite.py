"""DeepSeek-V2-Lite: the minimal expert-parallel reference family.

Reference: pegainfer-deepseek-v2-lite/ (the reference's "first gate" —
greedy serving, plain-RoPE context, MLA attention, 64 routed experts
top-6 + 2 shared, first layer dense, EP=2 host-staged expert split,
src/{config,ep,model,runtime,host_ops}.rs). TPU-first differences:

- **Compressed-KV (absorbed-MLA) decode cache.** The reference caches the
  materialized per-head K/V on the host (host_ops.rs DecodeCache). Here
  decode caches only the 512-dim latent c_kv (post kv_a_layernorm) plus
  the 64-dim shared rope key per token, and absorbs kv_b into the query /
  output projections — the MLA inference identity:
      q_nope · k_nope = (q_nope · W_kb) · c_kv,   o = (attn · c_kv) · W_vb
  9× smaller cache than per-head K/V, and the decode attention is two
  MXU GEMMs over the latent instead of a head-materialized gather.
- **EP over a device mesh**, not two explicit CUDA ranks: the stacked
  expert weights shard over the mesh's ep axis and ops.moe_ep (AG/RS
  shard_map — the same transport the DSv4 engine uses) computes the
  routed sum; the reference's 32/32 split (ep.rs ExpertParallelLayout)
  is the ep=2 mesh case.
- Slot-state runtime (no paged KV) like DSv4 here: per-request cache rows
  sized to max_model_len, bs<=2 greedy serving matching the reference's
  serial generator (runtime.rs generate_greedy).
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pegainfer_tpu.ops.norm import rms_norm
from pegainfer_tpu.ops.rope import rope_inv_freq

log = logging.getLogger("pegainfer.dsv2lite")


@dataclass(frozen=True)
class DSv2LiteConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    moe_intermediate_size: int
    num_hidden_layers: int
    first_k_dense_replace: int
    num_attention_heads: int
    kv_lora_rank: int
    qk_nope_head_dim: int
    qk_rope_head_dim: int
    v_head_dim: int
    n_routed_experts: int
    n_shared_experts: int
    num_experts_per_token: int
    routed_scaling_factor: float
    norm_topk_prob: bool
    rms_norm_eps: float
    rope_theta: float
    max_position_embeddings: int
    eos_token_id: int = 100001
    bos_token_id: int = 100000

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @staticmethod
    def from_model_path(model_path: str) -> "DSv2LiteConfig":
        """Parse + capability-validate a checkpoint config (reference
        Config::from_model_dir / validate_lite, config.rs:58-180 — the
        exact-constant asserts are relaxed to the capability class this
        engine implements: no q_lora, plain RoPE)."""
        with open(os.path.join(model_path, "config.json")) as f:
            c = json.load(f)
        if c.get("model_type") != "deepseek_v2":
            raise ValueError(
                f"DeepSeek-V2-Lite expects model_type=deepseek_v2, got "
                f"{c.get('model_type')}")
        if c.get("q_lora_rank") is not None:
            raise ValueError(
                "DeepSeek-V2-Lite first gate expects q_lora_rank=null "
                f"(got {c.get('q_lora_rank')}) — the full V2 q-LoRA path "
                "is not implemented (reference config.rs:96-99)")
        if c.get("rope_scaling") is not None:
            log.warning("rope_scaling present but the Lite gate serves "
                        "plain-RoPE context only (reference runtime.rs "
                        "supported_plain_rope_context)")
        eos = c.get("eos_token_id", 100001)
        if isinstance(eos, list):
            eos = eos[0]
        return DSv2LiteConfig(
            vocab_size=c["vocab_size"],
            hidden_size=c["hidden_size"],
            intermediate_size=c["intermediate_size"],
            moe_intermediate_size=c["moe_intermediate_size"],
            num_hidden_layers=c["num_hidden_layers"],
            first_k_dense_replace=c.get("first_k_dense_replace", 1),
            num_attention_heads=c["num_attention_heads"],
            kv_lora_rank=c["kv_lora_rank"],
            qk_nope_head_dim=c["qk_nope_head_dim"],
            qk_rope_head_dim=c["qk_rope_head_dim"],
            v_head_dim=c["v_head_dim"],
            n_routed_experts=c["n_routed_experts"],
            n_shared_experts=c["n_shared_experts"],
            num_experts_per_token=c["num_experts_per_tok"],
            routed_scaling_factor=c.get("routed_scaling_factor", 1.0),
            norm_topk_prob=c.get("norm_topk_prob", False),
            rms_norm_eps=c["rms_norm_eps"],
            rope_theta=c.get("rope_theta", 10000.0),
            max_position_embeddings=c.get("max_position_embeddings", 4096),
            eos_token_id=eos,
            bos_token_id=c.get("bos_token_id", 100000),
        )


# ── Params ───────────────────────────────────────────────────────────────
# Projections stored [in, out] (forward is x @ W); attention/norm leaves
# stacked over ALL layers; dense-MLP leaves stacked over the first
# ``first_k_dense_replace`` layers; MoE leaves over the rest. Expert stacks
# use the ops.moe_ep layout: w1/w3 [E, I, D], w2 [E, D, I] (sharded on E
# under an ep mesh).


def params_from_state_dict(cfg: DSv2LiteConfig, sd: Dict[str, Any],
                           dtype=jnp.bfloat16):
    L, Ld = cfg.num_hidden_layers, cfg.first_k_dense_replace
    Lm = L - Ld

    def t(name):
        return jnp.asarray(np.asarray(sd[name]).T).astype(dtype)

    def v(name):
        return jnp.asarray(np.asarray(sd[name])).astype(dtype)

    def stack(fmt, lo, hi, f=t):
        return jnp.stack([f(fmt.format(i)) for i in range(lo, hi)])

    pre = "model.layers.{}"
    attn = {
        "input_ln": stack(pre + ".input_layernorm.weight", 0, L, v),
        "post_ln": stack(pre + ".post_attention_layernorm.weight", 0, L, v),
        "wq": stack(pre + ".self_attn.q_proj.weight", 0, L),
        "kv_a": stack(pre + ".self_attn.kv_a_proj_with_mqa.weight", 0, L),
        "kv_a_norm": stack(pre + ".self_attn.kv_a_layernorm.weight", 0, L, v),
        "kv_b": stack(pre + ".self_attn.kv_b_proj.weight", 0, L),
        "wo": stack(pre + ".self_attn.o_proj.weight", 0, L),
    }
    dense = {
        "gate": stack(pre + ".mlp.gate_proj.weight", 0, Ld),
        "up": stack(pre + ".mlp.up_proj.weight", 0, Ld),
        "down": stack(pre + ".mlp.down_proj.weight", 0, Ld),
    }

    def estack(which):
        # [Lm, E, I, D] in the moe_ep layout (weight rows are [I, D] in
        # HF's [out, in] convention already — no transpose)
        return jnp.stack([
            jnp.stack([
                jnp.asarray(np.asarray(
                    sd[f"model.layers.{i}.mlp.experts.{e}.{which}.weight"]
                )).astype(dtype)
                for e in range(cfg.n_routed_experts)
            ])
            for i in range(Ld, L)
        ])

    moe = {
        "gate_w": stack(pre + ".mlp.gate.weight", Ld, L),
        "shared_gate": stack(pre + ".mlp.shared_experts.gate_proj.weight",
                             Ld, L),
        "shared_up": stack(pre + ".mlp.shared_experts.up_proj.weight", Ld, L),
        "shared_down": stack(pre + ".mlp.shared_experts.down_proj.weight",
                             Ld, L),
        "experts_w1": estack("gate_proj"),
        "experts_w3": estack("up_proj"),
        "experts_w2": jnp.stack([
            jnp.stack([
                jnp.asarray(np.asarray(
                    sd[f"model.layers.{i}.mlp.experts.{e}.down_proj.weight"]
                )).astype(dtype)
                for e in range(cfg.n_routed_experts)
            ])
            for i in range(Ld, L)
        ]),
    }
    return {
        "embed": v("model.embed_tokens.weight"),
        "attn": attn,
        "dense": dense,
        "moe": moe,
        "final_ln": v("model.norm.weight"),
        "lm_head": t("lm_head.weight"),
    }


def init_random_params(cfg: DSv2LiteConfig, seed: int = 0,
                       dtype=jnp.bfloat16, scale: float = 0.05):
    rng = np.random.default_rng(seed)
    L, Ld = cfg.num_hidden_layers, cfg.first_k_dense_replace
    Lm = L - Ld
    D, H = cfg.hidden_size, cfg.num_attention_heads
    r, dn, dr, dv = (cfg.kv_lora_rank, cfg.qk_nope_head_dim,
                     cfg.qk_rope_head_dim, cfg.v_head_dim)
    E, Im, I = cfg.n_routed_experts, cfg.moe_intermediate_size, cfg.intermediate_size
    Ish = cfg.n_shared_experts * Im

    def w(*shape):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale
        ).astype(dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    return {
        "embed": w(cfg.vocab_size, D),
        "attn": {
            "input_ln": ones(L, D), "post_ln": ones(L, D),
            "wq": w(L, D, H * (dn + dr)),
            "kv_a": w(L, D, r + dr),
            "kv_a_norm": ones(L, r),
            "kv_b": w(L, r, H * (dn + dv)),
            "wo": w(L, H * dv, D),
        },
        "dense": {
            "gate": w(Ld, D, I), "up": w(Ld, D, I), "down": w(Ld, I, D),
        },
        "moe": {
            "gate_w": w(Lm, D, E),
            "shared_gate": w(Lm, D, Ish), "shared_up": w(Lm, D, Ish),
            "shared_down": w(Lm, Ish, D),
            "experts_w1": w(Lm, E, Im, D),
            "experts_w3": w(Lm, E, Im, D),
            "experts_w2": w(Lm, E, D, Im),
        },
        "final_ln": ones(D),
        "lm_head": w(D, cfg.vocab_size),
    }


# ── State: per-slot compressed-KV decode cache ──────────────────────────


def make_state(cfg: DSv2LiteConfig, max_slots: int, max_model_len: int,
               dtype=jnp.float32):
    """Row ``max_slots`` is the dead slot (padding rows write there)."""
    S = max_slots + 1
    L = cfg.num_hidden_layers
    return {
        "ckv": jnp.zeros((L, S, max_model_len, cfg.kv_lora_rank), dtype),
        "kr": jnp.zeros((L, S, max_model_len, cfg.qk_rope_head_dim), dtype),
    }


# ── Forward pieces ───────────────────────────────────────────────────────


def _rope(x, positions, inv_freq):
    """Interleaved-pair rotation on the FULL last dim (the DeepSeek rope
    convention — ops.dsa.rope_interleaved with rotary_dim = D; HF's
    deinterleave-then-rotate_half is this composed with a fixed
    permutation, which cancels in the q·k dot)."""
    from pegainfer_tpu.ops.dsa import rope_interleaved

    return rope_interleaved(x, positions, inv_freq, x.shape[-1])


def _route(cfg: DSv2LiteConfig, gate_w, h):
    """Softmax scoring + greedy top-k (reference host_ops
    topk_softmax_routes; HF DeepseekV2MoE topk_method=greedy)."""
    logits = (h.astype(jnp.float32) @ gate_w.astype(jnp.float32))
    scores = jax.nn.softmax(logits, axis=-1)
    wts, idx = lax.top_k(scores, cfg.num_experts_per_token)
    if cfg.norm_topk_prob:
        wts = wts / jnp.sum(wts, axis=-1, keepdims=True)
    return idx, wts * cfg.routed_scaling_factor


def _silu_mlp(h, gate, up, down):
    hf = h.astype(jnp.float32)
    g = hf @ gate.astype(jnp.float32)
    u = hf @ up.astype(jnp.float32)
    return (jax.nn.silu(g) * u) @ down.astype(jnp.float32)


def _moe_dense(cfg: DSv2LiteConfig, lw, h, idx, wts):
    """All-experts dense compute + top-k mask combine (capacity-free; the
    T×E GEMM form the MXU likes — no gathers). DECODE-SIZED T only: FLOPs
    and the [T, E, I] intermediates scale with E. h: [T, D] → [T, D] f32."""
    hf = h.astype(jnp.float32)
    g = jnp.einsum("td,eid->tei", hf, lw["experts_w1"].astype(jnp.float32))
    u = jnp.einsum("td,eid->tei", hf, lw["experts_w3"].astype(jnp.float32))
    act = jax.nn.silu(g) * u
    y = jnp.einsum("tei,edi->ted", act, lw["experts_w2"].astype(jnp.float32))
    E = cfg.n_routed_experts
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [T, K, E]
    w_full = jnp.einsum("tk,tke->te", wts.astype(jnp.float32), onehot)
    return jnp.einsum("te,ted->td", w_full, y)


def _moe_grouped(cfg: DSv2LiteConfig, lw, h, idx, wts):
    """Prefill-scale routed experts: expert-sorted token-slots + ragged
    group GEMMs (the dsv4._moe T>=8 form — O(T·K·I·D) instead of the
    dense O(T·E·I·D), no [T, E, I] intermediates)."""
    T = h.shape[0]
    K = cfg.num_experts_per_token
    E = cfg.n_routed_experts
    M = T * K
    flat_e = idx.reshape(M)
    flat_t = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
    flat_w = wts.astype(jnp.float32).reshape(M)
    order = jnp.argsort(flat_e)
    src_t = flat_t[order]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    dn = lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((1,), (2,)), ((), ())),
        lhs_ragged_dimensions=[0],
        rhs_group_dimensions=[0],
    )
    xs = h[src_t]  # [M, D] in expert order, native dtype
    ge = lax.ragged_dot_general(xs, lw["experts_w1"], group_sizes, dn,
                                preferred_element_type=jnp.float32)
    ue = lax.ragged_dot_general(xs, lw["experts_w3"], group_sizes, dn,
                                preferred_element_type=jnp.float32)
    act = (jax.nn.silu(ge) * ue).astype(h.dtype)
    per = lax.ragged_dot_general(act, lw["experts_w2"], group_sizes, dn,
                                 preferred_element_type=jnp.float32)
    per = per * flat_w[order][:, None]
    return jnp.zeros((T, h.shape[1]), jnp.float32).at[src_t].add(per)


def _moe(cfg: DSv2LiteConfig, lw, h, mesh=None, transport: str = "dense"):
    idx, wts = _route(cfg, lw["gate_w"], h)
    shared = _silu_mlp(h, lw["shared_gate"], lw["shared_up"],
                       lw["shared_down"])
    T = h.shape[0]
    if mesh is not None and "ep" in mesh.axis_names:
        from pegainfer_tpu.ops import moe_ep as ep

        if T >= 8:
            # prefill scale: token shipping + grouped local GEMMs (the
            # dsv4 EP prefill form — the gather-based moe_ep materializes
            # per-(token, k) expert weights and is decode-sized only)
            n = mesh.shape["ep"]
            Tp = -(-T // n) * n
            pad = Tp - T
            routed = ep.moe_ep_a2a_chunked(
                mesh,
                jnp.pad(h.astype(jnp.float32), ((0, pad), (0, 0))),
                lw["experts_w1"].astype(jnp.float32),
                lw["experts_w2"].astype(jnp.float32),
                lw["experts_w3"].astype(jnp.float32),
                jnp.pad(idx, ((0, pad), (0, 0))),
                jnp.pad(wts, ((0, pad), (0, 0))),
                swiglu_limit=0.0, axis="ep", transport=transport,
            )[:T]
        else:
            routed = ep.moe_ep(mesh, h, lw["experts_w1"], lw["experts_w2"],
                               lw["experts_w3"], idx, wts, swiglu_limit=0.0,
                               axis="ep")
    elif T >= 8:
        routed = _moe_grouped(cfg, lw, h, idx, wts)
    else:
        routed = _moe_dense(cfg, lw, h, idx, wts)
    return shared + routed


def _layer_weights(params, li):
    return jax.tree.map(lambda a: a[li], params["attn"])


def _split_kv_b(cfg: DSv2LiteConfig, kv_b):
    """kv_b [r, H*(dn+dv)] → (Wk [r, H, dn], Wv [r, H, dv])."""
    H, dn, dv = cfg.num_attention_heads, cfg.qk_nope_head_dim, cfg.v_head_dim
    kvb = kv_b.reshape(cfg.kv_lora_rank, H, dn + dv)
    return kvb[..., :dn], kvb[..., dn:]


# ── Prefill (full-sequence, materialized K/V like the reference) ────────


def prefill(cfg: DSv2LiteConfig, params, state, tokens, seq_len, slot,
            mesh=None, return_all_logits: bool = False,
            transport: str = "dense"):
    """tokens: [T] int32 (padded); seq_len: valid count; writes the slot's
    compressed-KV cache rows [0, T). Returns (state, last_logits [V] f32,
    all_logits | None)."""
    T = tokens.shape[0]
    H = cfg.num_attention_heads
    dn, dr, dv, r = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                     cfg.v_head_dim, cfg.kv_lora_rank)
    x = params["embed"][tokens]
    positions = jnp.arange(T, dtype=jnp.int32)
    inv = jnp.asarray(rope_inv_freq(dr, cfg.rope_theta), jnp.float32)
    scale = cfg.qk_head_dim ** -0.5
    mask = (positions[None, :] <= positions[:, None]) & (
        positions[None, :] < seq_len)

    ckv_rows, kr_rows = [], []
    for li in range(cfg.num_hidden_layers):
        lw = _layer_weights(params, li)
        h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
        q = (h @ lw["wq"]).reshape(T, H, dn + dr)
        q_nope, q_rope = q[..., :dn], q[..., dn:]
        kva = h @ lw["kv_a"]
        ckv = rms_norm(kva[:, :r], lw["kv_a_norm"], cfg.rms_norm_eps)
        k_rope = _rope(kva[:, r:][:, None, :], positions[:, None], inv)
        q_rope = _rope(q_rope, positions[:, None], inv)
        kv = (ckv @ lw["kv_b"]).reshape(T, H, dn + dv)
        k_nope, val = kv[..., :dn], kv[..., dn:]
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_rope, (T, H, dr))], axis=-1)
        qf = jnp.concatenate([q_nope, q_rope], axis=-1)
        att = jnp.einsum("thd,shd->ths", qf.astype(jnp.float32),
                         k.astype(jnp.float32)) * scale
        att = jnp.where(mask[:, None, :], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("ths,shd->thd", att, val.astype(jnp.float32))
        x = x + (o.reshape(T, H * dv).astype(x.dtype) @ lw["wo"])
        h2 = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
        if li < cfg.first_k_dense_replace:
            dw = jax.tree.map(lambda a: a[li], params["dense"])
            y = _silu_mlp(h2, dw["gate"], dw["up"], dw["down"])
        else:
            mw = jax.tree.map(
                lambda a: a[li - cfg.first_k_dense_replace], params["moe"])
            y = _moe(cfg, mw, h2, mesh=mesh, transport=transport)
        x = x + y.astype(x.dtype)
        ckv_rows.append(ckv.astype(state["ckv"].dtype))
        kr_rows.append(k_rope[:, 0].astype(state["kr"].dtype))

    # clamp to the cache length: the executor pads T to a pow2 bucket,
    # which can exceed max_model_len for non-pow2 limits; rows past the
    # cache are padding (admission bounds seq_len to max_model_len)
    Tc = min(T, state["ckv"].shape[2])
    ckv_all = jnp.stack(ckv_rows)[:, :Tc]  # [L, Tc, r]
    kr_all = jnp.stack(kr_rows)[:, :Tc]    # [L, Tc, dr]
    ckv_st = lax.dynamic_update_slice(
        state["ckv"], ckv_all[:, None], (0, slot, 0, 0))
    kr_st = lax.dynamic_update_slice(
        state["kr"], kr_all[:, None], (0, slot, 0, 0))
    state = {"ckv": ckv_st, "kr": kr_st}

    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if return_all_logits:
        all_logits = (x @ params["lm_head"]).astype(jnp.float32)
        return state, all_logits[seq_len - 1], all_logits
    last = (x[seq_len - 1][None] @ params["lm_head"])[0].astype(jnp.float32)
    return state, last, None


# ── Decode (absorbed MLA over the latent cache) ─────────────────────────


def decode(cfg: DSv2LiteConfig, params, state, tokens, positions, slots,
           mesh=None, transport: str = "dense"):
    """One greedy step for a padded batch. tokens/positions/slots: [B];
    padding rows: slots == dead slot (their cache writes land there).
    Returns (state, logits [B, V] f32)."""
    B = tokens.shape[0]
    H = cfg.num_attention_heads
    dn, dr, dv, r = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                     cfg.v_head_dim, cfg.kv_lora_rank)
    T = state["ckv"].shape[2]
    x = params["embed"][tokens]
    inv = jnp.asarray(rope_inv_freq(dr, cfg.rope_theta), jnp.float32)
    scale = cfg.qk_head_dim ** -0.5
    pos_ids = jnp.arange(T, dtype=jnp.int32)

    new_ckv, new_kr = [], []
    for li in range(cfg.num_hidden_layers):
        lw = _layer_weights(params, li)
        h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
        q = (h @ lw["wq"]).reshape(B, H, dn + dr)
        q_nope, q_rope = q[..., :dn], q[..., dn:]
        q_rope = _rope(q_rope, positions[:, None], inv)
        kva = h @ lw["kv_a"]
        ckv_t = rms_norm(kva[:, :r], lw["kv_a_norm"], cfg.rms_norm_eps)
        kr_t = _rope(kva[:, r:][:, None, :], positions[:, None], inv)[:, 0]
        Wk, Wv = _split_kv_b(cfg, lw["kv_b"])
        # absorbed query: q_abs [B, H, r]
        q_abs = jnp.einsum("bhd,rhd->bhr", q_nope.astype(jnp.float32),
                           Wk.astype(jnp.float32))
        ckv_cache = state["ckv"][li, slots]  # [B, T, r]
        kr_cache = state["kr"][li, slots]    # [B, T, dr]
        # splice this step's entry (cache write happens after the layer —
        # attention must still see it)
        ckv_cache = _put_row(ckv_cache, ckv_t, positions)
        kr_cache = _put_row(kr_cache, kr_t, positions)
        att = (
            jnp.einsum("bhr,btr->bht", q_abs,
                       ckv_cache.astype(jnp.float32))
            + jnp.einsum("bhd,btd->bht", q_rope.astype(jnp.float32),
                         kr_cache.astype(jnp.float32))
        ) * scale
        valid = pos_ids[None, :] <= positions[:, None]
        att = jnp.where(valid[:, None, :], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        o_lat = jnp.einsum("bht,btr->bhr", att,
                           ckv_cache.astype(jnp.float32))
        o = jnp.einsum("bhr,rhd->bhd", o_lat, Wv.astype(jnp.float32))
        x = x + (o.reshape(B, H * dv).astype(x.dtype) @ lw["wo"])
        h2 = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
        if li < cfg.first_k_dense_replace:
            dw = jax.tree.map(lambda a: a[li], params["dense"])
            y = _silu_mlp(h2, dw["gate"], dw["up"], dw["down"])
        else:
            mw = jax.tree.map(
                lambda a: a[li - cfg.first_k_dense_replace], params["moe"])
            y = _moe(cfg, mw, h2, mesh=mesh, transport=transport)
        x = x + y.astype(x.dtype)
        new_ckv.append(ckv_t)
        new_kr.append(kr_t)

    # land this step's cache rows: one all-layers dus per batch row
    # (2*B ops, not 2*B*L — the rows are already [L, ...] stacks)
    ckv_st, kr_st = state["ckv"], state["kr"]
    ckv_new = jnp.stack(new_ckv)  # [L, B, r]
    kr_new = jnp.stack(new_kr)    # [L, B, dr]
    L = cfg.num_hidden_layers
    for b in range(B):
        ckv_st = lax.dynamic_update_slice(
            ckv_st, ckv_new[:, b].astype(ckv_st.dtype).reshape(L, 1, 1, r),
            (0, slots[b], positions[b], 0))
        kr_st = lax.dynamic_update_slice(
            kr_st, kr_new[:, b].astype(kr_st.dtype).reshape(L, 1, 1, dr),
            (0, slots[b], positions[b], 0))
    state = {"ckv": ckv_st, "kr": kr_st}
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return state, logits


def _put_row(cache, row, positions):
    """cache [B, T, d] with row [B, d] placed at per-row positions."""
    B = cache.shape[0]
    onehot = (jnp.arange(cache.shape[1])[None, :]
              == positions[:, None])[..., None]
    return jnp.where(onehot, row[:, None, :].astype(cache.dtype), cache)


# ── Slot export/import (PD handoff + engine contract) ───────────────────


def slot_export(state, slot):
    return {"ckv": state["ckv"][:, slot], "kr": state["kr"][:, slot]}


def slot_import(state, snap, slot):
    ckv = lax.dynamic_update_slice(
        state["ckv"], snap["ckv"][:, None].astype(state["ckv"].dtype),
        (0, slot, 0, 0))
    kr = lax.dynamic_update_slice(
        state["kr"], snap["kr"][:, None].astype(state["kr"].dtype),
        (0, slot, 0, 0))
    return {"ckv": ckv, "kr": kr}


# ── Runtime / engine ─────────────────────────────────────────────────────


def make_runtime(cfg: DSv2LiteConfig, params, max_model_len: int = 4096,
                 max_slots: int = 2, state_dtype=jnp.float32, mesh=None,
                 transport: str = None):
    from pegainfer_tpu.engine.jax_executor import ModelRuntime

    if transport is None:
        transport = "ragged" if jax.default_backend() == "tpu" else "dense" 

    state = make_state(cfg, max_slots, max_model_len, dtype=state_dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        # experts sharded over ep; everything else replicated
        def place(tree, spec_fn):
            return jax.tree.map(
                lambda a: jax.device_put(
                    a, NamedSharding(mesh, spec_fn(a))), tree)

        params = dict(params)
        params["moe"] = dict(params["moe"])
        for k in ("experts_w1", "experts_w2", "experts_w3"):
            params["moe"][k] = jax.device_put(
                params["moe"][k],
                NamedSharding(mesh, P(None, "ep")))
        rest = {k: v for k, v in params.items() if k != "moe"}
        rest = place(rest, lambda a: P())
        params.update(rest)
        moe_rest = {k: v for k, v in params["moe"].items()
                    if not k.startswith("experts_")}
        params["moe"].update(place(moe_rest, lambda a: P()))
        state = place(state, lambda a: P())

    def prefill_fn(params_, state_, tokens, seq_len, page_table, slot):
        state_, last, _ = prefill(cfg, params_, state_, tokens, seq_len,
                                  slot, mesh=mesh, transport=transport)
        return state_, last, None

    def prefill_all_fn(params_, state_, tokens, seq_len, page_table, slot):
        return prefill(cfg, params_, state_, tokens, seq_len, slot,
                       mesh=mesh, return_all_logits=True,
                       transport=transport)

    def decode_fn(params_, state_, tokens, positions, tables, seq_lens,
                  slots):
        return decode(cfg, params_, state_, tokens, positions, slots,
                      mesh=mesh, transport=transport)

    return ModelRuntime(
        prefill_fn=prefill_fn,
        prefill_all_logits_fn=prefill_all_fn,
        decode_fn=decode_fn,
        params=params,
        state=state,
        page_size=1,
        num_pages=max_model_len * max_slots + 2,
        stop_token_ids=frozenset({cfg.eos_token_id}),
        max_model_len=max_model_len,
        vocab_size=cfg.vocab_size,
        max_slots=max_slots,
        slot_export_fn=slot_export,
        slot_import_fn=slot_import,
    )


def probe_model(model_path: str) -> bool:
    """Reference probe_config_json (lib.rs:20-43), capability-shaped."""
    try:
        with open(os.path.join(model_path, "config.json")) as f:
            c = json.load(f)
    except OSError:
        return False
    return (c.get("model_type") == "deepseek_v2"
            and c.get("q_lora_rank") is None)


def start_engine(model_path: str, options=None, ep_size: Optional[int] = None):
    """Reference start_engine (engine.rs): greedy bs<=2 serving; EP over a
    mesh when ep_size > 1 (the reference's fixed EP=2 layout generalized
    to any expert-divisible world)."""
    from pegainfer_tpu.engine.contract import EngineHandle, EngineLoadOptions
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler
    from pegainfer_tpu.utils.weights import load_state_dict

    opts = options or EngineLoadOptions()
    cfg = DSv2LiteConfig.from_model_path(model_path)
    sd = load_state_dict(model_path)
    params = params_from_state_dict(cfg, sd)
    del sd
    mesh = None
    n_dev = len(jax.devices())
    ep = ep_size if ep_size is not None else (2 if n_dev >= 2 else 1)
    if ep > 1:
        if n_dev < ep or cfg.n_routed_experts % ep:
            raise ValueError(
                f"ep_size={ep} needs {ep} devices (have {n_dev}) and must "
                f"divide n_routed_experts={cfg.n_routed_experts}")
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:ep]), ("ep",))
        log.info("DeepSeek-V2-Lite EP=%d over mesh %s", ep, mesh)
    runtime = make_runtime(
        cfg, params,
        max_model_len=opts.max_model_len or 4096,
        max_slots=min(opts.max_batch_size, 2),  # reference: serial/bs<=2
        mesh=mesh,
    )
    executor = JaxExecutor(runtime, opts)
    return start_scheduler(executor, seed=opts.seed)
