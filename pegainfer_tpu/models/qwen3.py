"""Qwen3 (dense GQA) — TPU-native functional forward.

Capability parity with the reference Qwen3-4B/8B engine crate
(pegainfer-qwen3-4b: config src/config.rs:22-112, forward
src/batch_decode.rs:82-295, prefill src/prefill.rs), re-designed for XLA:

- layer weights are STACKED on a leading [L, ...] axis and the block runs
  under ``lax.scan`` — one trace/compile for all 36 layers. The KV pool is
  NOT carried through the scan (a carried pool forces pool-sized copies per
  step): decode attention reads past pages + the in-flight current k/v, and
  one fused scatter after the scan writes all layers' new rows (donated);
- no CUDA-Graph machinery: one jitted step per (batch-bucket, page-bucket);
- QKV are separate GEMMs over the same activations (XLA schedules them
  back-to-back; column-slicing a fused GEMM is numerically identical, but
  separate arrays shard cleanly under GSPMD);
- per-head q/k RMSNorm + RoPE (HF Qwen3 semantics, our parity oracle);
- softmax/normalization accumulate in f32, activations bf16.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pegainfer_tpu.ops import attention as att
from pegainfer_tpu.ops.norm import rms_norm
from pegainfer_tpu.ops.rope import apply_rope, rope_cos_sin, rope_inv_freq


def _proj(container, name, x):
    """Apply a projection that may be bf16 ([in, out]) or int8 weight-only
    ({"q8": int8 [in, out], "s": f32 [out]} — ops/quant.py int8_linear)."""
    w = container[name]
    if isinstance(w, dict):
        from pegainfer_tpu.ops.quant import int8_linear

        return int8_linear(x, w["q8"], w["s"])
    return x @ w


def _qs_int8(w):
    """Stacked [.., in, out] → per-output-channel int8 + f32 scales."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "s": jnp.squeeze(scale, -2)}


_qs_int8_donating = jax.jit(_qs_int8, donate_argnums=0)


def quantize_params_int8(params):
    """Weight-only int8 (per output channel) for the streaming-bound
    matrices; norms/embed stay bf16. Halves decode HBM traffic — opt-in
    approximate serving mode (greedy outputs may differ from bf16).

    CONSUMES ``params``: each bf16 matrix buffer is donated to its quantize
    step so peak device memory stays ~1 matrix above the bf16 footprint.
    """
    big = ("wq", "wk", "wv", "wo", "w_gate_up", "w_down")
    layers = {}
    src = params["layers"]
    for k in list(src.keys()):
        w = src[k]
        layers[k] = _qs_int8_donating(w) if k in big else w
    head = _qs_int8_donating(params["lm_head"])
    return {
        "embed": params["embed"],
        "layers": layers,
        "final_ln": params["final_ln"],
        "lm_head": head,
    }


@dataclass(frozen=True)
class Qwen3Config:
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    vocab_size: int
    rms_norm_eps: float
    rope_theta: float
    tie_word_embeddings: bool
    eos_token_id: int = 151645
    stop_token_ids: tuple = ()
    max_position_embeddings: int = 40960

    @staticmethod
    def from_hf(cfg: Any) -> "Qwen3Config":
        """From a transformers Qwen3Config instance."""
        eos = cfg.eos_token_id
        if isinstance(eos, (list, tuple)):
            stop = tuple(eos)
            eos = eos[0]
        else:
            stop = (eos,)
        return Qwen3Config(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            num_key_value_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            vocab_size=cfg.vocab_size,
            rms_norm_eps=cfg.rms_norm_eps,
            rope_theta=cfg.rope_theta,
            tie_word_embeddings=cfg.tie_word_embeddings,
            eos_token_id=eos,
            stop_token_ids=stop,
            max_position_embeddings=getattr(cfg, "max_position_embeddings", 40960),
        )

    @staticmethod
    def from_model_path(model_path: str) -> "Qwen3Config":
        with open(os.path.join(model_path, "config.json")) as f:
            c = json.load(f)
        stop: List[int] = []
        gen_path = os.path.join(model_path, "generation_config.json")
        if os.path.exists(gen_path):
            with open(gen_path) as f:
                g = json.load(f)
            eos = g.get("eos_token_id", c.get("eos_token_id"))
            stop = eos if isinstance(eos, list) else [eos]
        eos_single = c.get("eos_token_id")
        if isinstance(eos_single, list):
            eos_single = eos_single[0]
        return Qwen3Config(
            hidden_size=c["hidden_size"],
            intermediate_size=c["intermediate_size"],
            num_hidden_layers=c["num_hidden_layers"],
            num_attention_heads=c["num_attention_heads"],
            num_key_value_heads=c["num_key_value_heads"],
            head_dim=c.get("head_dim", c["hidden_size"] // c["num_attention_heads"]),
            vocab_size=c["vocab_size"],
            rms_norm_eps=c["rms_norm_eps"],
            rope_theta=c["rope_theta"],
            tie_word_embeddings=c.get("tie_word_embeddings", False),
            eos_token_id=eos_single,
            stop_token_ids=tuple(stop) if stop else (eos_single,),
            max_position_embeddings=c.get("max_position_embeddings", 40960),
        )


# ── Params ───────────────────────────────────────────────────────────────
# Pytree layout: projections stored as [in_dim, out_dim] (forward is x @ W),
# layer weights stacked on axis 0.
#
# {
#   "embed":    [V, D]
#   "layers": {
#     "input_ln": [L, D],
#     "wq": [L, D, Hq*hd], "wk": [L, D, Hkv*hd], "wv": [L, D, Hkv*hd],
#     "q_norm": [L, hd], "k_norm": [L, hd],
#     "wo": [L, Hq*hd, D],
#     "post_ln": [L, D],
#     "w_gate_up": [L, D, 2*I],   (gate ‖ up, reference vstack pattern)
#     "w_down": [L, I, D],
#   },
#   "final_ln": [D],
#   "lm_head":  [D, V]   (embed.T when tied)
# }


def params_from_state_dict(cfg: Qwen3Config, sd: Dict[str, Any], dtype=jnp.bfloat16):
    """Build the stacked pytree from an HF-named state dict (numpy or jnp
    arrays, HF [out, in] layout). The stacked-[L] layout is the TPU analog of
    the reference's per-layer fused loads (qwen3-4b/src/weights.rs:121-291):
    one lax.scan over the layer axis replaces 36 unrolled layer programs."""

    def get(name):
        return jnp.asarray(sd[name], dtype=dtype)

    def proj(name):  # HF [out,in] → ours [in,out]
        return get(name).T

    L = cfg.num_hidden_layers
    stack = lambda f: jnp.stack([f(i) for i in range(L)])  # noqa: E731

    layers = {
        "input_ln": stack(lambda i: get(f"model.layers.{i}.input_layernorm.weight")),
        "wq": stack(lambda i: proj(f"model.layers.{i}.self_attn.q_proj.weight")),
        "wk": stack(lambda i: proj(f"model.layers.{i}.self_attn.k_proj.weight")),
        "wv": stack(lambda i: proj(f"model.layers.{i}.self_attn.v_proj.weight")),
        "q_norm": stack(lambda i: get(f"model.layers.{i}.self_attn.q_norm.weight")),
        "k_norm": stack(lambda i: get(f"model.layers.{i}.self_attn.k_norm.weight")),
        "wo": stack(lambda i: proj(f"model.layers.{i}.self_attn.o_proj.weight")),
        "post_ln": stack(
            lambda i: get(f"model.layers.{i}.post_attention_layernorm.weight")
        ),
        "w_gate_up": stack(
            lambda i: jnp.concatenate(
                [
                    proj(f"model.layers.{i}.mlp.gate_proj.weight"),
                    proj(f"model.layers.{i}.mlp.up_proj.weight"),
                ],
                axis=1,
            )
        ),
        "w_down": stack(lambda i: proj(f"model.layers.{i}.mlp.down_proj.weight")),
    }
    embed = get("model.embed_tokens.weight")
    if cfg.tie_word_embeddings:
        lm_head = embed.T
    else:
        lm_head = proj("lm_head.weight")
    return {
        "embed": embed,
        "layers": layers,
        "final_ln": get("model.norm.weight"),
        "lm_head": lm_head,
    }


def init_random_params(cfg: Qwen3Config, seed: int = 0, dtype=jnp.bfloat16, scale=0.02):
    """Random params at real shapes (benchmarks / smoke tests)."""
    rng = np.random.default_rng(seed)
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, hd, V = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.vocab_size,
    )

    def w(*shape):
        return jnp.asarray(rng.normal(0, scale, shape), dtype=dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype=dtype)

    embed = w(V, D)
    return {
        "embed": embed,
        "layers": {
            "input_ln": ones(L, D),
            "wq": w(L, D, Hq * hd),
            "wk": w(L, D, Hkv * hd),
            "wv": w(L, D, Hkv * hd),
            "q_norm": ones(L, hd),
            "k_norm": ones(L, hd),
            "wo": w(L, Hq * hd, D),
            "post_ln": ones(L, D),
            "w_gate_up": w(L, D, 2 * I),
            "w_down": w(L, I, D),
        },
        "final_ln": ones(D),
        "lm_head": embed.T if cfg.tie_word_embeddings else w(D, V),
    }


def init_bench_params(cfg: Qwen3Config, dtype=jnp.bfloat16, fill: float = 0.01):
    """Constant-filled params at real shapes, allocated device-side.

    For benchmarks only: matmul/attention timing on TPU is data-independent,
    and filling on device skips minutes of host-side RNG for ~4B elements.
    """
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, hd, V = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.vocab_size,
    )

    def w(*shape):
        return jnp.full(shape, fill, dtype=dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype=dtype)

    return {
        "embed": w(V, D),
        "layers": {
            "input_ln": ones(L, D),
            "wq": w(L, D, Hq * hd),
            "wk": w(L, D, Hkv * hd),
            "wv": w(L, D, Hkv * hd),
            "q_norm": ones(L, hd),
            "k_norm": ones(L, hd),
            "wo": w(L, Hq * hd, D),
            "post_ln": ones(L, D),
            "w_gate_up": w(L, D, 2 * I),
            "w_down": w(L, I, D),
        },
        "final_ln": ones(D),
        "lm_head": w(D, V),
    }


def init_bench_params_int8(cfg: Qwen3Config, dtype=jnp.bfloat16,
                           fill: float = 0.01):
    """Constant-filled bench params with the big matrices created DIRECTLY
    in the int8 weight-only container — no bf16 tree is ever materialized
    (a Qwen3-8B bf16 tree is ~16.4 GB and exceeds a v5e chip's HBM, so
    init-then-quantize cannot work there). Quantizing a constant fill is
    closed-form: q8 = 127, per-output-channel scale = fill / 127 —
    identical to quantize_params_int8(init_bench_params(cfg))."""
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, hd, V = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.vocab_size,
    )

    # the staged path quantizes the dtype-rounded fill — match it exactly
    fill_eff = float(jnp.asarray(fill, dtype))

    def w8(*shape):
        return {
            "q8": jnp.full(shape, 127, jnp.int8),
            "s": jnp.full(shape[:-2] + shape[-1:], fill_eff / 127.0,
                          jnp.float32),
        }

    def w(*shape):
        return jnp.full(shape, fill, dtype=dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype=dtype)

    return {
        "embed": w(V, D),
        "layers": {
            "input_ln": ones(L, D),
            "wq": w8(L, D, Hq * hd),
            "wk": w8(L, D, Hkv * hd),
            "wv": w8(L, D, Hkv * hd),
            "q_norm": ones(L, hd),
            "k_norm": ones(L, hd),
            "wo": w8(L, Hq * hd, D),
            "post_ln": ones(L, D),
            "w_gate_up": w8(L, D, 2 * I),
            "w_down": w8(L, I, D),
        },
        "final_ln": ones(D),
        "lm_head": w8(D, V),
    }


def make_kv_pages(cfg: Qwen3Config, num_pages: int, page_size: int, dtype=jnp.bfloat16):
    """KV block array: [L, Hkv, num_pages, 2, page_size, hd] — head-major and
    k/v-ADJACENT, so a page's k+v is one contiguous [2, page_size, hd] block
    and the Pallas decode kernel fetches it in ONE DMA (halves the
    scalar-core DMA-issue count, the long-context bottleneck —
    docs/ROADMAP.md #8)."""
    return jnp.zeros(
        (
            cfg.num_hidden_layers,
            cfg.num_key_value_heads,
            num_pages,
            2,
            page_size,
            cfg.head_dim,
        ),
        dtype=dtype,
    )


def kv_bytes_per_page(cfg: Qwen3Config, page_size: int, dtype=jnp.bfloat16) -> int:
    itemsize = jnp.dtype(dtype).itemsize
    return (
        cfg.num_hidden_layers
        * 2
        * page_size
        * cfg.num_key_value_heads
        * cfg.head_dim
        * itemsize
    )


# ── Forward building blocks ──────────────────────────────────────────────


def use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def export_pages(kv_pages, page_ids):
    """Gather page contents for a PD handoff (engine/pd.py):
    [L,Hkv,pages,2,ps,hd] x ids [n] -> [L,Hkv,n,2,ps,hd]."""
    return jnp.take(kv_pages, page_ids, axis=2)


def import_pages(kv_pages, rows, page_ids):
    """Scatter handed-off page rows into this pool's pages (dus chain —
    in place on a donated buffer, docs/PERF.md)."""
    n = rows.shape[2]
    for i in range(n):
        upd = lax.dynamic_slice_in_dim(rows, i, 1, axis=2)
        kv_pages = lax.dynamic_update_slice(
            kv_pages, upd.astype(kv_pages.dtype),
            (0, 0, page_ids[i], 0, 0, 0))
    return kv_pages


def make_runtime(cfg: Qwen3Config, params, num_pages: int, page_size: int = 16,
                 kv_dtype=jnp.bfloat16, use_pallas: Optional[bool] = None):
    """Bundle jit-ready closures + device KV for the generic JaxExecutor.

    ``use_pallas`` selects the Pallas attention kernels (default: on TPU
    backends, off elsewhere — the XLA reference path is the CPU-test oracle).
    """
    from pegainfer_tpu.engine.jax_executor import ModelRuntime

    up = use_pallas_default() if use_pallas is None else use_pallas
    # Mosaic wants the DMA'd [page, head_dim] blocks lane-aligned
    up = up and cfg.head_dim % 128 == 0
    kv = make_kv_pages(cfg, num_pages, page_size, dtype=kv_dtype)
    return ModelRuntime(
        # slot args unused: Qwen3 has no per-request recurrent state
        prefill_fn=lambda w, kv, t, sl, pt, slot: prefill(cfg, w, kv, t, sl, pt,
                                                          use_pallas=up),
        prefill_all_logits_fn=lambda w, kv, t, sl, pt, slot: prefill(
            cfg, w, kv, t, sl, pt, return_all_logits=True, use_pallas=up
        ),
        decode_fn=lambda w, kv, t, p, pt, sl, slots: decode(cfg, w, kv, t, p, pt, sl,
                                                            use_pallas=up),
        decode_wa_fn=lambda w, kv, pend, t, p, pt, sl, slots: decode_wa(
            cfg, w, kv, pend, t, p, pt, sl, use_pallas=up
        ),
        make_pend_fn=lambda B: make_pend(cfg, B, kv_dtype),
        flush_pend_fn=flush_pend,
        prefill_chunk_fn=lambda w, kv, t, sp, va, pt, slot: prefill_chunk(
            cfg, w, kv, t, sp, va, pt, use_pallas=up
        ),
        prefill_chunk_wa_fn=lambda w, kv, cpend, t, sp, va, pt, slot:
            prefill_chunk_wa(cfg, w, kv, cpend, t, sp, va, pt, use_pallas=up),
        prefill_chunk_wa_all_fn=lambda w, kv, cpend, t, sp, va, pt, slot:
            prefill_chunk_wa(cfg, w, kv, cpend, t, sp, va, pt, use_pallas=up,
                             return_all_logits=True),
        make_chunk_pend_fn=lambda nP: make_chunk_pend(cfg, nP, page_size, kv_dtype),
        flush_chunk_pend_fn=flush_chunk_pend,
        mixed_chunk_wa_fn=lambda w, kv, cpend, dpend, t, sp, va, pt, slot,
            dt, dp, dtabs, dsl, dslots: mixed_chunk_wa(
                cfg, w, kv, cpend, dpend, t, sp, va, pt, dt, dp, dtabs, dsl,
                use_pallas=up),
        params=params,
        state=kv,
        page_size=page_size,
        num_pages=num_pages,
        stop_token_ids=frozenset(cfg.stop_token_ids),
        max_model_len=cfg.max_position_embeddings,
        vocab_size=cfg.vocab_size,
        # attention state is fully determined by the pages — prefix pages
        # are shareable across requests (docs/prefix-cache-design.md)
        supports_prefix_cache=True,
        export_pages_fn=export_pages,
        import_pages_fn=import_pages,
    )


def _qkv(cfg: Qwen3Config, lw, x, cos, sin):
    """x: [T, D] → q [T, Hq, hd], k, v [T, Hkv, hd] with qk-norm + RoPE."""
    T = x.shape[0]
    hd = cfg.head_dim
    q = _proj(lw, "wq", x).reshape(T, cfg.num_attention_heads, hd)
    k = _proj(lw, "wk", x).reshape(T, cfg.num_key_value_heads, hd)
    v = _proj(lw, "wv", x).reshape(T, cfg.num_key_value_heads, hd)
    q = rms_norm(q, lw["q_norm"], cfg.rms_norm_eps)
    k = rms_norm(k, lw["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return q, k, v


def _mlp(cfg: Qwen3Config, lw, x):
    gu = _proj(lw, "w_gate_up", x)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return _proj(lw, "w_down", act)


def _scale(cfg: Qwen3Config) -> float:
    return cfg.head_dim ** -0.5


# ── Prefill: one request, padded length T ────────────────────────────────


def _write_pages(kv_pages, k_all, v_all, page_table):
    """Land all layers' prefill k/v ([L, T, Hkv, hd] each) into the pool:
    one dynamic_update_slice per page (in place on a donated buffer —
    fancy-index scatters copy the pool per call on TPU, docs/PERF.md).
    Null-page table entries absorb padding writes (last-wins, garbage by
    contract)."""
    L, T, Hkv, hd = k_all.shape
    ps = kv_pages.shape[4]
    nP = page_table.shape[0]
    # [2, L, T, Hkv, hd] → [nP, L, Hkv, 2, ps, hd] (k/v-adjacent pool order)
    rows = (
        jnp.stack([k_all, v_all])
        .reshape(2, L, nP, ps, Hkv, hd)
        .transpose(2, 1, 4, 0, 3, 5)
        .astype(kv_pages.dtype)
    )
    for p in range(nP):
        upd = rows[p].reshape(L, Hkv, 1, 2, ps, hd)
        kv_pages = lax.dynamic_update_slice(
            kv_pages, upd, (0, 0, page_table[p], 0, 0, 0)
        )
    return kv_pages


def prefill(cfg: Qwen3Config, params, kv_pages, tokens, seq_len, page_table,
            return_all_logits: bool = False, use_pallas: bool = False):
    """Prefill one prompt and write its KV.

    tokens: [T] int32 (padded); seq_len: scalar int32 (valid count);
    page_table: [ceil(T/page_size)] int32 (padding entries = null page).
    Returns (kv_pages, last_logits [V] f32, all_logits [T, V] f32 | None).
    """
    T = tokens.shape[0]
    x = params["embed"][tokens]
    positions = jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope_cos_sin(
        positions, jnp.asarray(rope_inv_freq(cfg.head_dim, cfg.rope_theta), jnp.float32),
        x.dtype,
    )
    scale = _scale(cfg)

    # The pool is write-only during prefill (self-attention reads the
    # in-flight k/v) — keep it OUT of the scan and land all layers' pages
    # with one dus chain after (in place on the donated buffer; per-layer
    # slice+scatter+write-back cost pool-sized traffic, docs/PERF.md).
    def layer(x, lw):
        h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lw, h, cos, sin)
        if use_pallas and T % 128 == 0:
            from pegainfer_tpu.ops.pallas import flash_prefill

            o = flash_prefill(q, k, v, seq_len, scale)
        else:
            o = att.prefill_attention(q, k, v, seq_len, scale)
        x = x + _proj(lw, "wo", o.reshape(T, -1))
        h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(cfg, lw, h)
        return x, (k, v)

    x, (k_all, v_all) = lax.scan(layer, x, params["layers"])
    kv_pages = _write_pages(kv_pages, k_all, v_all, page_table)
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if return_all_logits:
        all_logits = _proj(params, "lm_head", x).astype(jnp.float32)
        last = all_logits[seq_len - 1]
        return kv_pages, last, all_logits
    last_h = x[seq_len - 1]
    last_logits = _proj(params, "lm_head", last_h[None, :])[0].astype(jnp.float32)
    return kv_pages, last_logits, None


# ── Chunked prefill continuation ─────────────────────────────────────────


def make_chunk_pend(cfg: Qwen3Config, n_pages: int, page_size: int,
                    kv_dtype=jnp.bfloat16):
    """Empty pending record for write-ahead chunked prefill: the previous
    chunk's pages, landed at the start of the next chunk (or by
    ``flush_chunk_pend`` after the last). pages 0 = null page."""
    L, Hkv, hd = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    return {
        "rows": jnp.zeros((n_pages, L, Hkv, 2, page_size, hd), kv_dtype),
        "pages": jnp.zeros((n_pages,), jnp.int32),
    }


def flush_chunk_pend(kv_pages, cpend):
    """Land a chunk-pend into the pool (per-page dus chain — in place)."""
    rows, pages = cpend["rows"], cpend["pages"]
    nP, L, Hkv, _, ps, hd = rows.shape
    rows = rows.astype(kv_pages.dtype)
    for p in range(nP):
        kv_pages = lax.dynamic_update_slice(
            kv_pages, rows[p].reshape(L, Hkv, 1, 2, ps, hd),
            (0, 0, pages[p], 0, 0, 0),
        )
    return kv_pages


def prefill_chunk_wa(cfg: Qwen3Config, params, kv_pages, cpend, tokens,
                     start_pos, valid, page_table, use_pallas: bool = False,
                     return_all_logits: bool = False):
    """WRITE-AHEAD prefill continuation: the pool is written exactly once,
    at the start (landing the PREVIOUS chunk via ``cpend``), and only read
    after — attention gathers the past from pages and splices the chunk's
    own in-flight k/v over the chunk region. This chunk's pages return as
    the new cpend (the stepper flushes the last one). Avoids the per-layer
    pool slice/write-back that costs pool-sized HBM traffic (docs/PERF.md).

    tokens: [Tc] (chunk, padded; Tc % page_size == 0 and start_pos %
    page_size == 0); start_pos: scalar; valid: scalar valid count in this
    chunk; page_table: [P] the request's FULL page table (pages for the
    chunk already allocated). Returns (kv_pages, cpend', last_logits [V])
    where last_logits is for chunk position valid-1.
    """
    Tc = tokens.shape[0]
    page_size = kv_pages.shape[4]
    kv_pages = flush_chunk_pend(kv_pages, cpend)
    x = params["embed"][tokens]
    positions = start_pos + jnp.arange(Tc, dtype=jnp.int32)
    cos, sin = rope_cos_sin(
        positions, jnp.asarray(rope_inv_freq(cfg.head_dim, cfg.rope_theta), jnp.float32),
        x.dtype,
    )
    scale = _scale(cfg)
    first_page = start_pos // page_size
    chunk_table = lax.dynamic_slice_in_dim(page_table, first_page, Tc // page_size)
    P = page_table.shape[0]
    S = P * page_size

    def layer(x, inputs):
        li, lw = inputs
        h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lw, h, cos, sin)
        # one gather straight off the full pool (no per-layer slice) fetches
        # k AND v (adjacent in the page), then splice this chunk's in-flight
        # rows over its (stale) region. Advanced indices (li, page_table)
        # separated by the Hkv slice → batch dims to the FRONT:
        # [P, Hkv, 2, ps, hd].
        kv_seq = kv_pages[li, :, page_table]
        k_seq = kv_seq[:, :, 0].transpose(0, 2, 1, 3).reshape(S, -1, q.shape[2])
        v_seq = kv_seq[:, :, 1].transpose(0, 2, 1, 3).reshape(S, -1, q.shape[2])
        k_seq = lax.dynamic_update_slice(k_seq, k.astype(k_seq.dtype), (start_pos, 0, 0))
        v_seq = lax.dynamic_update_slice(v_seq, v.astype(v_seq.dtype), (start_pos, 0, 0))
        if use_pallas:
            from pegainfer_tpu.ops.pallas import flash_attention

            o = flash_attention(q, k_seq, v_seq, start_pos + valid, start_pos, scale)
        else:
            o = att.chunk_attention_seq(q, k_seq, v_seq, start_pos, scale)
        x = x + _proj(lw, "wo", o.reshape(Tc, -1))
        h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(cfg, lw, h)
        return x, (k, v)

    L = cfg.num_hidden_layers
    x, (k_all, v_all) = lax.scan(
        layer, x, (jnp.arange(L, dtype=jnp.int32), params["layers"])
    )
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    nPc = Tc // page_size
    rows = (
        jnp.stack([k_all, v_all])
        .reshape(2, L, nPc, page_size, Hkv, hd)
        .transpose(2, 1, 4, 0, 3, 5)
        .astype(kv_pages.dtype)
    )
    cpend = {"rows": rows, "pages": chunk_table}
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if return_all_logits:
        # echo+logprobs chunking: the executor reduces these to per-token
        # logprobs on device, so only [Tc] floats ever cross the link
        all_logits = _proj(params, "lm_head", x).astype(jnp.float32)
        return kv_pages, cpend, all_logits[valid - 1], all_logits
    last = _proj(params, "lm_head", x[valid - 1][None, :])[0].astype(jnp.float32)
    return kv_pages, cpend, last


def mixed_chunk_wa(cfg: Qwen3Config, params, kv_pages, cpend, dpend,
                   chunk_tokens, start_pos, valid, page_table,
                   dec_tokens, dec_positions, dec_tables, dec_seq_lens,
                   use_pallas: bool = False):
    """FUSED ragged mixed step: one dispatch runs a prefill chunk's Tc rows
    ‖ B decode rows (one per active stream) through SHARED GEMMs, splitting
    only attention — the reference's unified forward realized as true GEMM
    fusion (pegainfer-qwen3-4b/src/unified_forward.rs:1-78: "GEMMs over
    [prefill tokens ‖ decode tokens] in one batch, split only attention").

    vs the time-sliced interleave (scheduler._unified_interleaved): the
    decode stream gets a token per CHUNK dispatch with no separate decode
    dispatch, so the worst decode gap is one chunk and the fixed dispatch
    cost is paid once — mixed chunks can shrink without halving prefill
    throughput.

    Both write-ahead pends land at the start (disjoint requests — a
    prefilling request is never decoding). Returns
    (kv_pages, cpend', dpend', last_logits [V], dec_logits [B, V]).
    """
    Tc = chunk_tokens.shape[0]
    B = dec_tokens.shape[0]
    page_size = kv_pages.shape[4]
    kv_pages = flush_chunk_pend(kv_pages, cpend)
    kv_pages = flush_pend(kv_pages, dpend, jnp.ones((B,), bool))

    x = params["embed"][jnp.concatenate([chunk_tokens, dec_tokens])]
    positions = jnp.concatenate(
        [start_pos + jnp.arange(Tc, dtype=jnp.int32), dec_positions])
    cos, sin = rope_cos_sin(
        positions,
        jnp.asarray(rope_inv_freq(cfg.head_dim, cfg.rope_theta), jnp.float32),
        x.dtype,
    )
    scale = _scale(cfg)
    first_page = start_pos // page_size
    chunk_table = lax.dynamic_slice_in_dim(page_table, first_page,
                                           Tc // page_size)
    P = page_table.shape[0]
    S = P * page_size
    dec_page_ids = jnp.take_along_axis(
        dec_tables, (dec_positions // page_size)[:, None], axis=1)[:, 0]
    dec_slots = dec_positions % page_size

    def layer(x, inputs):
        li, lw = inputs
        h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lw, h, cos, sin)
        qp, kp, vp = q[:Tc], k[:Tc], v[:Tc]
        qd, kd, vd = q[Tc:], k[Tc:], v[Tc:]
        # prefill rows: pool gather + in-flight splice (= prefill_chunk_wa)
        kv_seq = kv_pages[li, :, page_table]
        k_seq = kv_seq[:, :, 0].transpose(0, 2, 1, 3).reshape(S, -1, q.shape[2])
        v_seq = kv_seq[:, :, 1].transpose(0, 2, 1, 3).reshape(S, -1, q.shape[2])
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
                qd, kv_pages, kv_pages, dec_tables, dec_seq_lens, scale,
                cur_k=kd, cur_v=vd, layer_id=li,
                fold_heads=dec_tables.shape[1] * page_size >= 8192)
        else:
            o_p = att.chunk_attention_seq(qp, k_seq, v_seq, start_pos, scale)
            kpool = lax.dynamic_index_in_dim(kv_pages, li, axis=0,
                                             keepdims=False)
            o_d = att.paged_attention_decode(
                qd, kpool[:, :, 0], kpool[:, :, 1], dec_tables, dec_seq_lens,
                scale, cur_k=kd, cur_v=vd)
        o = jnp.concatenate([o_p.reshape(Tc, -1), o_d.reshape(B, -1)])
        x = x + _proj(lw, "wo", o)
        h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(cfg, lw, h)
        return x, (kp, vp, kd, vd)

    L = cfg.num_hidden_layers
    x, (k_all, v_all, kd_all, vd_all) = lax.scan(
        layer, x, (jnp.arange(L, dtype=jnp.int32), params["layers"])
    )
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    nPc = Tc // page_size
    rows = (
        jnp.stack([k_all, v_all])
        .reshape(2, L, nPc, page_size, Hkv, hd)
        .transpose(2, 1, 4, 0, 3, 5)
        .astype(kv_pages.dtype)
    )
    cpend = {"rows": rows, "pages": chunk_table}
    dpend = {
        "rows": jnp.stack([kd_all, vd_all], axis=3).transpose(1, 0, 2, 3, 4)
        .astype(kv_pages.dtype),
        "page_ids": dec_page_ids,
        "slots": dec_slots,
    }
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    sel = jnp.concatenate([jnp.reshape(jnp.asarray(valid - 1, jnp.int32), (1,)),
                           Tc + jnp.arange(B, dtype=jnp.int32)])
    logits = _proj(params, "lm_head", x[sel]).astype(jnp.float32)
    return kv_pages, cpend, dpend, logits[0], logits[1:]


def prefill_chunk(cfg: Qwen3Config, params, kv_pages, tokens, start_pos,
                  valid, page_table, use_pallas: bool = False):
    """Prefill continuation, self-contained form (chunk pages in the pool on
    return; the engine stepper uses ``prefill_chunk_wa`` + a final flush).
    Same contract as before: reference analog unified_forward.rs."""
    page_size = kv_pages.shape[4]
    cpend = make_chunk_pend(cfg, tokens.shape[0] // page_size, page_size,
                            kv_pages.dtype)
    kv_pages, cpend, last = prefill_chunk_wa(
        cfg, params, kv_pages, cpend, tokens, start_pos, valid, page_table,
        use_pallas=use_pallas,
    )
    kv_pages = flush_chunk_pend(kv_pages, cpend)
    return kv_pages, last


# ── Batched decode: one token per active request ─────────────────────────


def make_pend(cfg: Qwen3Config, B: int, kv_dtype=jnp.bfloat16):
    """An empty pending-KV record (write-ahead decode, see ``decode_wa``).

    page_ids 0 = null page: flushing an empty pend writes garbage to the
    null page, which holds garbage by contract.
    """
    L, Hkv, hd = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    return {
        "rows": jnp.zeros((B, L, Hkv, 2, hd), kv_dtype),
        "page_ids": jnp.zeros((B,), jnp.int32),
        "slots": jnp.zeros((B,), jnp.int32),
    }


def flush_pend(kv_pages, pend, live):
    """Write a pending-KV record into the pool. ``live``: [B] bool — rows
    of finished/released requests are redirected to the null page (their
    pages may already belong to another request).

    Implemented as a chain of per-row ``dynamic_update_slice`` ops, NOT a
    fancy-index scatter: XLA:TPU keeps dus on a donated buffer in place,
    while the equivalent scatter materializes a full pool copy per call
    (measured; docs/PERF.md).
    """
    pid = jnp.where(live, pend["page_ids"], 0)
    rows = pend["rows"].astype(kv_pages.dtype)
    B, L, Hkv, _, hd = rows.shape
    for b in range(B):
        upd = rows[b].reshape(L, Hkv, 1, 2, 1, hd)
        kv_pages = lax.dynamic_update_slice(
            kv_pages, upd, (0, 0, pid[b], 0, pend["slots"][b], 0)
        )
    return kv_pages


def decode_wa(cfg: Qwen3Config, params, kv_pages, pend, tokens, positions,
              page_tables, seq_lens, use_pallas: bool = False,
              _ablate: tuple = ()):
    """One WRITE-AHEAD decode step for a padded batch.

    The KV pool is read-only except for ONE in-place scatter at the start,
    which lands the PREVIOUS step's k/v (``pend``). This step's k/v are
    returned as the new ``pend`` (flowing into the next step, or flushed via
    ``flush_pend``). Rationale: any pool write after/among the layer-scan
    reads forces XLA to copy the multi-GB pool every step; write-before-read
    keeps the donated buffer aliased in place (docs/PERF.md). Attention reads
    past pages + the in-flight current k/v (cur_k/cur_v); on the Pallas path
    the kernel DMAs straight from the full pool (layer_id) so no per-layer
    slice is ever materialized.

    tokens, positions, seq_lens: [B] int32 — seq_lens counts tokens
    INCLUDING the one processed this step. page_tables: [B, P] int32;
    padding rows use the null page and seq_len 0 (their pend rows then
    target the null page automatically).
    Returns (kv_pages, pend', logits [B, V] f32).
    """
    B = tokens.shape[0]
    page_size = kv_pages.shape[4]
    # _ablate: cost-probe knobs (scripts/qwen3_step_ablation.py) — wrong
    # numerics, never set on serving paths.
    if "noflush" not in _ablate:
        kv_pages = flush_pend(kv_pages, pend, jnp.ones((B,), bool))

    x = params["embed"][tokens]
    cos, sin = rope_cos_sin(
        positions, jnp.asarray(rope_inv_freq(cfg.head_dim, cfg.rope_theta), jnp.float32),
        x.dtype,
    )
    scale = _scale(cfg)
    page_ids = jnp.take_along_axis(
        page_tables, (positions // page_size)[:, None], axis=1
    )[:, 0]
    slots = positions % page_size

    def layer(x, inputs):
        li, lw = inputs
        h = rms_norm(x, lw["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lw, h, cos, sin)
        if "noattn" in _ablate:
            o = jnp.zeros_like(q)
        elif use_pallas:
            from pegainfer_tpu.ops.pallas import paged_attention_decode

            # fold_heads at long context: one program per request (per-
            # head grid programs drain their DMA pipelines separately —
            # 16k-ctx kernel time 8.9 → 7.0 ms/36L folded; at short ctx
            # folding serializes the head streams and loses, so gate on
            # the static table span (scripts/paged_decode_probe.py)
            o = paged_attention_decode(
                q, kv_pages, kv_pages, page_tables, seq_lens, scale,
                cur_k=k, cur_v=v, layer_id=li,
                fold_heads=page_tables.shape[1] * page_size >= 8192)
        else:
            kp = lax.dynamic_index_in_dim(kv_pages, li, axis=0, keepdims=False)
            o = att.paged_attention_decode(q, kp[:, :, 0], kp[:, :, 1],
                                           page_tables, seq_lens, scale,
                                           cur_k=k, cur_v=v)
        x = x + _proj(lw, "wo", o.reshape(B, -1))
        h = rms_norm(x, lw["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(cfg, lw, h)
        return x, (k, v)

    L = cfg.num_hidden_layers
    x, (k_all, v_all) = lax.scan(
        layer, x, (jnp.arange(L, dtype=jnp.int32), params["layers"])
    )
    # [L, B, Hkv, hd] ×2 → [B, L, Hkv, 2, hd]
    rows = jnp.stack([k_all, v_all], axis=3).transpose(1, 0, 2, 3, 4)
    pend = {
        "rows": rows.astype(kv_pages.dtype),
        "page_ids": page_ids,
        "slots": slots,
    }
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    if "nohead" in _ablate:
        logits = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    else:
        logits = _proj(params, "lm_head", x).astype(jnp.float32)
    return kv_pages, pend, logits


def decode(cfg: Qwen3Config, params, kv_pages, tokens, positions, page_tables, seq_lens,
           use_pallas: bool = False):
    """One decode step for a padded batch (self-contained form: the current
    token's KV is in the pool on return). The engine hot path uses
    ``decode_wa`` instead, chaining the final write into the next step.

    tokens, positions, seq_lens: [B] int32 — seq_lens counts tokens INCLUDING
    the one produced by this step's KV write (i.e. positions + 1 for live
    rows). page_tables: [B, P] int32; padding rows must use the null page and
    seq_len 0.
    Returns (kv_pages, logits [B, V] f32).
    """
    B = tokens.shape[0]
    pend = make_pend(cfg, B, kv_pages.dtype)
    kv_pages, pend, logits = decode_wa(
        cfg, params, kv_pages, pend, tokens, positions, page_tables, seq_lens,
        use_pallas=use_pallas,
    )
    kv_pages = flush_pend(kv_pages, pend, jnp.ones((B,), bool))
    return kv_pages, logits
