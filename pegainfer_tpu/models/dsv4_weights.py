"""DeepSeek-V4 mp8 checkpoint loader.

Reference layout (deepseek-v4/src/weights.rs:128-166 + src/model.rs schema):
``<model>/mp8/model{rank}-mp8.safetensors`` for ranks 0..7, with vocab /
attention-head / o-group / index-head / expert shards per rank and
replicated norms, hc tensors, compressors, gates, and shared experts.

Two load modes:

- ``resident=True`` (default, matches the reference's quantized-in-HBM
  serving): FP8/FP4 tensors stay E4M3/E2M1 with E8M0 scales as
  {"q","s"} containers (ops/quant.py); the forward dequantizes on the fly.
  A real 671B checkpoint is ~0.7 TB in this form vs ~1.3 TB as bf16.
- ``resident=False``: dequantize everything to bf16 at load (debug/
  numerics-oracle mode).

The loader STREAMS tensors: each safetensors file is opened once, the
header parsed, and every tensor read with a seek at use time — peak host
memory is one full-model tensor (the 8-rank concat), never a whole rank
file, and far less than the model (reference analog: mmap'd shard loads,
pegainfer-core/src/weight_loader.rs:57-77).

Under GSPMD the re-assembled tensors are placed with the MP8
PartitionSpecs — the sharding axes are exactly the reference's
(vocab/heads/groups/experts), so each TPU shard holds the same bytes a
reference GPU rank held.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from pegainfer_tpu.models.dsv4 import DSv4Config
from pegainfer_tpu.ops import quant

WORLD = 8

_F4_LUT = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0], np.float32
)


class SafetensorsReader:
    """Per-tensor streaming safetensors reader.

    The Python safetensors bindings in this environment cannot materialize
    F8/E8M0/F4 tensors (numpy lacks the dtypes they getattr for), so this
    parses the header and views the bytes with ml_dtypes. Packed F4 (two
    E2M1 nibbles per byte, low nibble first) decodes via LUT. Tensors are
    read with seek+read on demand — a lookup costs only that tensor's bytes.
    """

    def __init__(self, path: str):
        import ml_dtypes

        self._path = path
        self._dtype_map = {
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
        with open(path, "rb") as f:
            n = int.from_bytes(f.read(8), "little")
            self._header = json.loads(f.read(n))
            self._base = 8 + n
        self._header.pop("__metadata__", None)

    def keys(self):
        return self._header.keys()

    def shape(self, name: str) -> tuple:
        """Header-only shape lookup (no data read). Packed-F4 tensors
        report their LOGICAL (unpacked) shape, matching __getitem__."""
        return tuple(self._header[name]["shape"])

    def stored_dtype(self, name: str) -> str:
        return self._header[name]["dtype"]

    def __contains__(self, name: str) -> bool:
        return name in self._header

    def _read(self, name: str) -> bytes:
        info = self._header[name]
        st, en = info["data_offsets"]
        with open(self._path, "rb") as f:
            f.seek(self._base + st)
            return f.read(en - st)

    def __getitem__(self, name: str) -> np.ndarray:
        info = self._header[name]
        buf = self._read(name)
        shape, dt = info["shape"], info["dtype"]
        if dt in ("F4", "F4_E2M1", "F4_E2M1_X2"):
            raw = np.frombuffer(buf, np.uint8)
            lo = _F4_LUT[raw & 0xF]
            hi = _F4_LUT[raw >> 4]
            vals = np.stack([lo, hi], axis=-1).reshape(-1)
            return vals[: int(np.prod(shape))].reshape(shape)
        return np.frombuffer(buf, self._dtype_map[dt]).reshape(shape)

    def read_f4_packed(self, name: str):
        """Raw packed-F4 bytes [..., in/2] uint8 (low nibble first), or
        None when the tensor isn't stored packed (e.g. fixture files using
        an E4M3 container)."""
        info = self._header[name]
        if info["dtype"] not in ("F4", "F4_E2M1", "F4_E2M1_X2"):
            return None
        shape = info["shape"]
        raw = np.frombuffer(self._read(name), np.uint8)
        return raw.reshape(*shape[:-1], shape[-1] // 2)


def read_safetensors_raw(path: str) -> Dict[str, np.ndarray]:
    """Materialize every tensor of a file (tests/tools; load_params streams
    instead)."""
    r = SafetensorsReader(path)
    return {k: r[k] for k in r.keys()}


def _rank_files(model_path: str) -> List[str]:
    return [
        os.path.join(model_path, "mp8", f"model{r}-mp8.safetensors")
        for r in range(WORLD)
    ]


def load_params(cfg: DSv4Config, model_path: str, tp_size: int = 1,
                dtype=jnp.bfloat16, resident: bool = True,
                validate: bool = True) -> Dict[str, Any]:
    if validate:
        # header-only manifest check: fail fast (seconds) instead of
        # mid-way through a multi-hour 0.7 TB load — the reference gates
        # loads the same way (deepseek-v4/tests/mp8_manifest.rs)
        from pegainfer_tpu.models.dsv4_manifest import validate_checkpoint

        problems = validate_checkpoint(cfg, model_path)
        if problems:
            head = "; ".join(problems[:5])
            raise ValueError(
                f"mp8 checkpoint fails manifest validation "
                f"({len(problems)} problems): {head}"
            )
    ranks = [SafetensorsReader(p) for p in _rank_files(model_path)]

    def rep(name):  # replicated tensor: take rank 0
        return np.asarray(ranks[0][name])

    def cat(name, axis=0):  # sharded: concatenate ranks
        return np.concatenate([np.asarray(r[name]) for r in ranks], axis=axis)

    def q4_resident(r, name) -> jnp.ndarray:
        # real checkpoints store packed F4: ship the raw bytes to the
        # device untouched. Fixture files use an E4M3 container (safetensors
        # python has no fp4 dtype): repack host-side (exact — every stored
        # value is E2M1-representable).
        raw = r.read_f4_packed(name)
        if raw is None:
            raw = quant.pack_fp4(np.asarray(r[name], np.float32))
        return jnp.asarray(raw)

    def s_resident(arr) -> jnp.ndarray:
        # scales may be stored E8M0 (real checkpoint) or f32 exact-pow2
        # (fixtures); both convert to bf16 exactly (pow2 values). The f32
        # hop happens in NUMPY: an e8m0 device array is rejected by this
        # TPU's XLA (see ops/quant.py SCALE_DTYPE).
        return jnp.asarray(np.asarray(arr).astype(np.float32),
                           quant.SCALE_DTYPE)

    def check_grid(q, s, prefix):
        # the container's block grid is inferred from shape ratios
        # (ops/quant.py dequant_any), which is exact iff each dim is a
        # single block or 128-aligned — true for tiny fixtures and the real
        # 128-blocked checkpoint alike; anything else must not load silently
        for ax in (-2, -1):
            assert s.shape[ax] == 1 or q.shape[ax] == 128 * s.shape[ax], \
                (prefix, q.shape, s.shape)

    def fp8(prefix, sharded: bool, axis: int = 0):
        if resident:
            if sharded:
                qs_parts = [
                    (np.asarray(r[f"{prefix}.weight"]),
                     np.asarray(r[f"{prefix}.scale"])) for r in ranks
                ]
                for qp, sp in qs_parts:
                    check_grid(qp, sp, prefix)
                q = np.concatenate([qp for qp, _ in qs_parts], axis=axis)
                s = np.concatenate([sp for _, sp in qs_parts], axis=axis)
            else:
                q = np.asarray(ranks[0][f"{prefix}.weight"])
                s = np.asarray(ranks[0][f"{prefix}.scale"])
                check_grid(q, s, prefix)
            return {"q": jnp.asarray(q).astype(quant.F8), "s": s_resident(s)}
        def deq(r):  # host-side: no e8m0 device arrays (see s_resident)
            return np.asarray(quant.dequant_fp8_blocks(
                jnp.asarray(r[f"{prefix}.weight"]),
                jnp.asarray(np.asarray(r[f"{prefix}.scale"], np.float32)),
                dtype=jnp.float32,
            ))

        if sharded:
            return cast(np.concatenate([deq(r) for r in ranks], axis=axis))
        return cast(deq(ranks[0]))

    def fp4_experts(pre: str, name: str, E_loc: int):
        """All ranks' expert tensors ``{pre}.ffn.experts.{ge}.{name}`` →
        stacked container [E, out, in] (resident) or bf16 array."""
        if resident:
            qs, ss = [], []
            for rank, r in enumerate(ranks):
                for le in range(E_loc):
                    ge = rank * E_loc + le
                    qs.append(q4_resident(r, f"{pre}.ffn.experts.{ge}.{name}.weight"))
                    ss.append(s_resident(r[f"{pre}.ffn.experts.{ge}.{name}.scale"]))
            assert ss[0].shape[-1] == 1 or \
                2 * qs[0].shape[-1] == 32 * ss[0].shape[-1], (pre, name)
            return {"q": jnp.stack(qs), "s": jnp.stack(ss)}
        parts = []
        for rank, r in enumerate(ranks):
            for le in range(E_loc):
                ge = rank * E_loc + le
                parts.append(np.asarray(quant.dequant_fp4_groups(
                    jnp.asarray(np.asarray(
                        r[f"{pre}.ffn.experts.{ge}.{name}.weight"],
                        np.float32)),
                    jnp.asarray(np.asarray(
                        r[f"{pre}.ffn.experts.{ge}.{name}.scale"],
                        np.float32)),
                    dtype=jnp.float32,
                )))
        return cast(np.stack(parts))

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
            "wq_a": fp8(f"{pre}.attn.wq_a", sharded=False),
            "wq_b": fp8(f"{pre}.attn.wq_b", sharded=True),
            "wkv": fp8(f"{pre}.attn.wkv", sharded=False),
            "wo_a": cast(cat(f"{pre}.attn.wo_a.weight")),
            # wo_b shards on its INPUT axis (each rank holds its o-groups'
            # lora columns, model.rs wo_b: [dim, local_groups*o_lora])
            "wo_b": fp8(f"{pre}.attn.wo_b", sharded=True, axis=1),
            "gate_weight": cast(rep(f"{pre}.ffn.gate.weight")),
            "shared_w1": fp8(f"{pre}.ffn.shared_experts.w1", False),
            "shared_w2": fp8(f"{pre}.ffn.shared_experts.w2", False),
            "shared_w3": fp8(f"{pre}.ffn.shared_experts.w3", False),
        }
        if li < cfg.n_hash_layers:
            lw["gate_tid2eid"] = jnp.asarray(
                rep(f"{pre}.ffn.gate.tid2eid"), jnp.int32
            )
        else:
            lw["gate_bias"] = cast(rep(f"{pre}.ffn.gate.bias"), True)

        for name in ("w1", "w2", "w3"):
            lw[f"experts_{name}"] = fp4_experts(pre, name, E_loc)

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
            lw["idx_wq_b"] = fp8(f"{ip}.wq_b", sharded=True)
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


def load_params_sharded(cfg: DSv4Config, model_path: str, mesh,
                        axis: str = "tp", dtype=jnp.bfloat16,
                        resident: bool = True,
                        validate: bool = True) -> Dict[str, Any]:
    """Shard-wise mp8 load: reads each mesh shard's rank files and places
    the bytes directly at that shard's mesh position — **no leaf ever
    materializes unsharded on one device**, so a real 671B checkpoint
    (~0.7 TB quantized-resident) loads with per-device HBM ≈ total/8.

    Returns params in the GROUPED serving layout (dsv4.group_params's
    {"segments": [...]} form) because stacking per-layer sharded arrays on
    device would double peak HBM; here each grouped leaf is assembled
    host-side per shard (peak host = one shard of one grouped leaf) and
    committed via jax.make_array_from_callback.

    Reference analog: each mp8 rank loads its own file straight onto its
    own GPU (deepseek-v4/src/weights.rs:17-100, direct/worker.rs:38-110).
    Mesh sizes 1/2/4/8 are supported (a device holds 8/n contiguous ranks;
    the shard axes are the reference's, parallel/sharding.py
    DSV4_LAYER_SHARDED), so the same checkpoint serves any sub-MP8 world.
    """
    import jax
    import ml_dtypes
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pegainfer_tpu.models.dsv4 import segments

    if validate:
        from pegainfer_tpu.models.dsv4_manifest import validate_checkpoint

        problems = validate_checkpoint(cfg, model_path)
        if problems:
            head = "; ".join(problems[:5])
            raise ValueError(
                f"mp8 checkpoint fails manifest validation "
                f"({len(problems)} problems): {head}"
            )
    n = mesh.shape[axis]
    if WORLD % n:
        raise ValueError(f"mesh {axis}={n} must divide mp8 world {WORLD}")
    rpd = WORLD // n  # contiguous checkpoint ranks per mesh shard
    ranks = [SafetensorsReader(p) for p in _rank_files(model_path)]
    BF = ml_dtypes.bfloat16
    SC = ml_dtypes.bfloat16  # quant.SCALE_DTYPE host-side (pow2-exact)

    def build(spec_t, shape, cb, weak_cache: bool = True):
        """Global array with PartitionSpec(*spec_t); cb(d) -> np shard for
        tp-position d (the full array when the spec is replicated)."""
        spec_t = tuple(spec_t)
        sharding = NamedSharding(mesh, P(*spec_t))
        dim = next((i for i, s in enumerate(spec_t) if s == axis), None)
        cache: Dict[int, np.ndarray] = {}

        def make(index):
            d = 0
            if dim is not None:
                sl = index[dim]
                d = (sl.start or 0) // (shape[dim] // n)
            if d not in cache:
                cache[d] = np.ascontiguousarray(cb(d))
            return cache[d]

        arr = jax.make_array_from_callback(tuple(shape), sharding, make)
        cache.clear()
        return arr

    def drs(d):  # the readers whose ranks live on mesh shard d
        return ranks[d * rpd:(d + 1) * rpd]

    # ── top-level ────────────────────────────────────────────────────────
    def cat_bf16(name, spec_t):
        per = ranks[0].shape(name)
        shape = (WORLD * per[0],) + per[1:]
        return build(spec_t, shape,
                     lambda d: np.concatenate(
                         [np.asarray(r[name], np.float32) for r in drs(d)]
                     ).astype(BF))

    def rep_arr(name, np_dtype):
        shape = ranks[0].shape(name)
        return build((None,) * len(shape), shape,
                     lambda d: np.asarray(ranks[0][name], np_dtype))

    # ── per-layer piece functions (one layer, one shard) ─────────────────
    def q4_packed_np(r, name) -> np.ndarray:
        raw = r.read_f4_packed(name)
        if raw is None:  # fixture E4M3 container → repack (exact)
            raw = quant.pack_fp4(np.asarray(r[name], np.float32))
        return raw

    def fp8_deq_np(r, prefix) -> np.ndarray:
        q = np.asarray(r[f"{prefix}.weight"], np.float32)
        s = np.asarray(r[f"{prefix}.scale"], np.float32)
        bo = q.shape[0] // s.shape[0]
        bi = q.shape[1] // s.shape[1]
        sfull = np.repeat(np.repeat(s, bo, axis=0), bi, axis=1)
        return (q * sfull).astype(BF)

    def check_grid_np(q_shape, s_shape, prefix):
        for ax in (-2, -1):
            assert s_shape[ax] == 1 or q_shape[ax] == 128 * s_shape[ax], \
                (prefix, q_shape, s_shape)

    def grouped(seg_layers, spec_t, per_shape, piece):
        """Stack piece(li, d) over the segment's layers → grouped leaf."""
        shape = (len(seg_layers),) + tuple(per_shape)
        return build((None,) + tuple(spec_t), shape,
                     lambda d: np.stack([piece(li, d) for li in seg_layers]))

    def leaf_rep(seg_layers, name_fn, np_dtype):
        per = ranks[0].shape(name_fn(seg_layers[0]))
        return grouped(
            seg_layers, (None,) * len(per), per,
            lambda li, d: np.asarray(ranks[0][name_fn(li)], np_dtype),
        )

    def leaf_cat(seg_layers, name_fn, spec_t, np_dtype, cat_axis=0):
        per = list(ranks[0].shape(name_fn(seg_layers[0])))
        per[cat_axis] *= WORLD
        return grouped(
            seg_layers, spec_t, per,
            lambda li, d: np.concatenate(
                [np.asarray(r[name_fn(li)], np.float32) for r in drs(d)],
                axis=cat_axis,
            ).astype(np_dtype),
        )

    def leaf_fp8(seg_layers, prefix_fn, sharded: bool, cat_axis=0):
        name0 = prefix_fn(seg_layers[0])
        q_per = list(ranks[0].shape(f"{name0}.weight"))
        s_per = list(ranks[0].shape(f"{name0}.scale"))
        check_grid_np(q_per, s_per, name0)
        if not sharded:
            if resident:
                return {
                    "q": grouped(seg_layers, (None, None), q_per,
                                 lambda li, d: np.asarray(
                                     ranks[0][f"{prefix_fn(li)}.weight"])),
                    "s": grouped(seg_layers, (None, None), s_per,
                                 lambda li, d: np.asarray(
                                     ranks[0][f"{prefix_fn(li)}.scale"],
                                     np.float32).astype(SC)),
                }
            return grouped(seg_layers, (None, None), q_per,
                           lambda li, d: fp8_deq_np(ranks[0], prefix_fn(li)))
        spec_t = tuple(DSV4_LAYER_SHARDED_BY_AXIS[cat_axis])
        qg = list(q_per)
        qg[cat_axis] *= WORLD
        if resident:
            sg = list(s_per)
            sg[cat_axis] *= WORLD
            return {
                "q": grouped(
                    seg_layers, spec_t, qg,
                    lambda li, d: np.concatenate(
                        [np.asarray(r[f"{prefix_fn(li)}.weight"])
                         for r in drs(d)], axis=cat_axis)),
                # scale grid axes are replicated (parallel/sharding.py
                # place_tree) — full 8-rank concat on every shard (≤1/64 of
                # the weight bytes)
                "s": grouped(
                    seg_layers, (None, None), sg,
                    lambda li, d: np.concatenate(
                        [np.asarray(r[f"{prefix_fn(li)}.scale"], np.float32)
                         for r in ranks], axis=cat_axis).astype(SC)),
            }
        return grouped(
            seg_layers, spec_t, qg,
            lambda li, d: np.concatenate(
                [fp8_deq_np(r, prefix_fn(li)) for r in drs(d)],
                axis=cat_axis))

    def leaf_fp4_experts(seg_layers, pre_fn, name, E_loc):
        """Expert stacks shard on the E axis (a device's experts = its
        ranks' E_loc-each, contiguous)."""
        name0 = f"{pre_fn(seg_layers[0])}.ffn.experts.0.{name}"
        w_per = ranks[0].shape(f"{name0}.weight")  # logical [out, in]
        out_d, in_d = w_per
        E = WORLD * E_loc

        def experts_of(d):
            for rr in range(d * rpd, (d + 1) * rpd):
                for le in range(E_loc):
                    yield ranks[rr], rr * E_loc + le

        if resident:
            s_per = ranks[0].shape(f"{name0}.scale")

            def q_piece(li, d):
                return np.stack([
                    q4_packed_np(r, f"{pre_fn(li)}.ffn.experts.{ge}.{name}.weight")
                    for r, ge in experts_of(d)
                ])

            def s_piece(li, d):
                return np.stack([
                    np.asarray(
                        r[f"{pre_fn(li)}.ffn.experts.{ge}.{name}.scale"],
                        np.float32).astype(SC)
                    for r, ge in experts_of(d)
                ])

            assert s_per[-1] == 1 or in_d == 32 * s_per[-1], (name0, s_per)
            return {
                "q": grouped(seg_layers, (axis, None, None),
                             (E, out_d, in_d // 2), q_piece),
                "s": grouped(seg_layers, (axis, None, None),
                             (E,) + tuple(s_per), s_piece),
            }

        def deq_piece(li, d):
            outs = []
            for r, ge in experts_of(d):
                q = np.asarray(
                    r[f"{pre_fn(li)}.ffn.experts.{ge}.{name}.weight"],
                    np.float32)
                s = np.asarray(
                    r[f"{pre_fn(li)}.ffn.experts.{ge}.{name}.scale"],
                    np.float32)
                g = q.shape[-1] // s.shape[-1]
                outs.append((q * np.repeat(s, g, axis=-1)).astype(BF))
            return np.stack(outs)

        return grouped(seg_layers, (axis, None, None), (E, out_d, in_d),
                       deq_piece)

    # axis map for fp8 leaves sharded on output (0) vs input (1) dims
    DSV4_LAYER_SHARDED_BY_AXIS = {0: (axis, None), 1: (None, axis)}

    E_loc = cfg.n_routed_experts // WORLD
    segs = []
    for (a, b, ratio, is_hash) in segments(cfg):
        L = list(range(a, b))
        pre = lambda li: f"layers.{li}"  # noqa: E731
        seg: Dict[str, Any] = {
            "attn_norm": leaf_rep(L, lambda li: f"layers.{li}.attn_norm.weight", BF),
            "ffn_norm": leaf_rep(L, lambda li: f"layers.{li}.ffn_norm.weight", BF),
            "hc_attn_fn": leaf_rep(L, lambda li: f"layers.{li}.hc_attn_fn", np.float32),
            "hc_attn_base": leaf_rep(L, lambda li: f"layers.{li}.hc_attn_base", np.float32),
            "hc_attn_scale": leaf_rep(L, lambda li: f"layers.{li}.hc_attn_scale", np.float32),
            "hc_ffn_fn": leaf_rep(L, lambda li: f"layers.{li}.hc_ffn_fn", np.float32),
            "hc_ffn_base": leaf_rep(L, lambda li: f"layers.{li}.hc_ffn_base", np.float32),
            "hc_ffn_scale": leaf_rep(L, lambda li: f"layers.{li}.hc_ffn_scale", np.float32),
            "attn_sink": leaf_cat(L, lambda li: f"layers.{li}.attn.attn_sink",
                                  (axis,), np.float32),
            "q_norm": leaf_rep(L, lambda li: f"layers.{li}.attn.q_norm.weight", BF),
            "kv_norm": leaf_rep(L, lambda li: f"layers.{li}.attn.kv_norm.weight", BF),
            "wq_a": leaf_fp8(L, lambda li: f"layers.{li}.attn.wq_a", False),
            "wq_b": leaf_fp8(L, lambda li: f"layers.{li}.attn.wq_b", True),
            "wkv": leaf_fp8(L, lambda li: f"layers.{li}.attn.wkv", False),
            "wo_a": leaf_cat(L, lambda li: f"layers.{li}.attn.wo_a.weight",
                             (axis, None), BF),
            "wo_b": leaf_fp8(L, lambda li: f"layers.{li}.attn.wo_b", True,
                             cat_axis=1),
            "gate_weight": leaf_rep(L, lambda li: f"layers.{li}.ffn.gate.weight", BF),
            "shared_w1": leaf_fp8(L, lambda li: f"layers.{li}.ffn.shared_experts.w1", False),
            "shared_w2": leaf_fp8(L, lambda li: f"layers.{li}.ffn.shared_experts.w2", False),
            "shared_w3": leaf_fp8(L, lambda li: f"layers.{li}.ffn.shared_experts.w3", False),
        }
        if is_hash:
            seg["gate_tid2eid"] = leaf_rep(
                L, lambda li: f"layers.{li}.ffn.gate.tid2eid", np.int32)
        else:
            seg["gate_bias"] = leaf_rep(
                L, lambda li: f"layers.{li}.ffn.gate.bias", np.float32)
        for nm in ("w1", "w2", "w3"):
            seg[f"experts_{nm}"] = leaf_fp4_experts(L, pre, nm, E_loc)
        if ratio > 0:
            seg["comp"] = {
                "ape": leaf_rep(L, lambda li: f"layers.{li}.attn.compressor.ape", np.float32),
                "wkv": leaf_rep(L, lambda li: f"layers.{li}.attn.compressor.wkv.weight", BF),
                "wgate": leaf_rep(L, lambda li: f"layers.{li}.attn.compressor.wgate.weight", BF),
                "norm": leaf_rep(L, lambda li: f"layers.{li}.attn.compressor.norm.weight", BF),
            }
        if ratio == 4:
            seg["idx_wq_b"] = leaf_fp8(
                L, lambda li: f"layers.{li}.attn.indexer.wq_b", True)
            seg["idx_weights_proj"] = leaf_cat(
                L, lambda li: f"layers.{li}.attn.indexer.weights_proj.weight",
                (axis, None), BF)
            seg["idx_comp"] = {
                "ape": leaf_rep(L, lambda li: f"layers.{li}.attn.indexer.compressor.ape", np.float32),
                "wkv": leaf_rep(L, lambda li: f"layers.{li}.attn.indexer.compressor.wkv.weight", BF),
                "wgate": leaf_rep(L, lambda li: f"layers.{li}.attn.indexer.compressor.wgate.weight", BF),
                "norm": leaf_rep(L, lambda li: f"layers.{li}.attn.indexer.compressor.norm.weight", BF),
            }
        segs.append(seg)

    return {
        "embed": cat_bf16("embed.weight", (axis, None)),
        "head": cat_bf16("head.weight", (axis, None)),
        "norm": rep_arr("norm.weight", BF),
        "hc_head_fn": rep_arr("hc_head_fn", np.float32),
        "hc_head_base": rep_arr("hc_head_base", np.float32),
        "hc_head_scale": rep_arr("hc_head_scale", np.float32),
        "segments": segs,
    }
