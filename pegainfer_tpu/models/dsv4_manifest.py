"""DSv4 mp8 checkpoint manifest validation.

TPU analog of the reference's 951-line manifest test
(deepseek-v4/tests/mp8_manifest.rs:1-951): before a multi-hour load of a
real ~0.7 TB checkpoint, verify every rank file carries exactly the
expected tensor set with the expected per-rank shard shapes and dtypes.
Header-only — validation reads the 8 safetensors headers, never tensor
bytes (``deep=True`` additionally cross-checks that small replicated
tensors are byte-identical across ranks).

The schema here is the single source of truth the loader
(dsv4_weights.load_params) reads; RoPE numerics are validated separately
against the official closed form (ops/dsa.yarn_inv_freq +
tests/test_dsv4_ops.py::test_yarn_matches_reference_formula — reference:
mp8_manifest.rs:23-35).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from pegainfer_tpu.models.dsv4 import DSv4Config

WORLD = 8

# dtype families a tensor may be stored as (fixtures use wider containers
# where the safetensors python binding lacks the narrow dtype)
BF16 = ("BF16",)
F32 = ("F32",)
FP8_W = ("F8_E4M3",)
SCALE = ("F8_E8M0", "F32")  # real checkpoints: E8M0; fixtures: exact-pow2 f32
FP4_W = ("F4", "F4_E2M1", "F4_E2M1_X2", "F8_E4M3")  # packed F4 or container
INT = ("I32", "I64")


@dataclass
class ExpectedTensor:
    shape: Tuple[int, ...]
    dtypes: Tuple[str, ...]
    # FP8/FP4 block-scale grids: a scale dim may be 1 (single block) or
    # shape/block; packed-F4 weights halve the last dim on disk
    scale_of: Tuple[int, ...] = ()
    scale_block: Tuple[int, int] = (128, 128)

    def check(self, name: str, shape: Tuple[int, ...], dtype: str,
              errors: List[str]) -> None:
        if dtype not in self.dtypes:
            errors.append(f"{name}: dtype {dtype}, expected one of {self.dtypes}")
        if self.scale_of:
            if len(shape) != len(self.scale_of):
                errors.append(f"{name}: scale rank {shape} vs {self.scale_of}")
                return
            for ax in range(len(shape)):
                q, s = self.scale_of[ax], shape[ax]
                blk = (self.scale_block[ax - len(shape) + 2]
                       if ax >= len(shape) - 2 else 1)
                # exact-grid rule, matching the loader's check_grid
                # (dsv4_weights.load_params): a scale dim is either a single
                # block (1) or the weight dim divided by the block size
                ok = (s == q) if blk == 1 else (s == 1 or q == blk * s)
                if not ok:
                    errors.append(
                        f"{name}: scale dim {ax} = {s} fits neither 1 nor "
                        f"{q}/{blk} for weight {self.scale_of}"
                    )
            return
        # F4 headers carry the LOGICAL shape (two nibbles per stored byte,
        # SafetensorsReader.read_f4_packed) — no adjustment needed
        if tuple(shape) != tuple(self.shape):
            errors.append(f"{name}: shape {tuple(shape)}, expected {self.shape}")


def _fp8(man: Dict[str, ExpectedTensor], prefix: str,
         shape: Tuple[int, ...]) -> None:
    man[f"{prefix}.weight"] = ExpectedTensor(shape, FP8_W)
    man[f"{prefix}.scale"] = ExpectedTensor((), SCALE, scale_of=shape)


def _fp4(man: Dict[str, ExpectedTensor], prefix: str,
         shape: Tuple[int, ...]) -> None:
    man[f"{prefix}.weight"] = ExpectedTensor(shape, FP4_W)
    man[f"{prefix}.scale"] = ExpectedTensor(
        (), SCALE, scale_of=shape, scale_block=(1, 32)
    )


def expected_rank_manifest(cfg: DSv4Config, rank: int) -> Dict[str, ExpectedTensor]:
    """Tensor name → expected (per-rank shard) shape/dtype for one mp8 rank
    file. Mirrors dsv4_weights.load_params' reads exactly."""
    D, n = cfg.dim, cfg.hc_mult
    H, hd = cfg.num_attention_heads, cfg.head_dim
    V, E = cfg.vocab_size, cfg.n_routed_experts
    mix_hc = (2 + n) * n
    for dim, what in ((V, "vocab"), (H, "heads"),
                      (cfg.o_groups * cfg.o_lora_rank, "o-group lora"),
                      (E, "experts"), (cfg.index_n_heads, "index heads")):
        if dim % WORLD:
            raise ValueError(f"{what} ({dim}) not divisible by world {WORLD}")
    E_loc = E // WORLD

    man: Dict[str, ExpectedTensor] = {
        "embed.weight": ExpectedTensor((V // WORLD, D), BF16),
        "head.weight": ExpectedTensor((V // WORLD, D), BF16),
        "norm.weight": ExpectedTensor((D,), BF16),
        "hc_head_fn": ExpectedTensor((n, n * D), F32),
        "hc_head_base": ExpectedTensor((n,), F32),
        "hc_head_scale": ExpectedTensor((1,), F32),
    }
    for li in range(cfg.n_layers):
        p = f"layers.{li}"
        ratio = cfg.compress_ratios[li]
        man[f"{p}.attn_norm.weight"] = ExpectedTensor((D,), BF16)
        man[f"{p}.ffn_norm.weight"] = ExpectedTensor((D,), BF16)
        for side in ("attn", "ffn"):
            man[f"{p}.hc_{side}_fn"] = ExpectedTensor((mix_hc, n * D), F32)
            man[f"{p}.hc_{side}_base"] = ExpectedTensor((mix_hc,), F32)
            man[f"{p}.hc_{side}_scale"] = ExpectedTensor((3,), F32)
        man[f"{p}.attn.attn_sink"] = ExpectedTensor((H // WORLD,), F32)
        man[f"{p}.attn.q_norm.weight"] = ExpectedTensor((cfg.q_lora_rank,), BF16)
        man[f"{p}.attn.kv_norm.weight"] = ExpectedTensor((hd,), BF16)
        _fp8(man, f"{p}.attn.wq_a", (cfg.q_lora_rank, D))
        _fp8(man, f"{p}.attn.wq_b", (H * hd // WORLD, cfg.q_lora_rank))
        _fp8(man, f"{p}.attn.wkv", (hd, D))
        man[f"{p}.attn.wo_a.weight"] = ExpectedTensor(
            (cfg.o_groups * cfg.o_lora_rank // WORLD, H * hd // cfg.o_groups),
            BF16,
        )
        _fp8(man, f"{p}.attn.wo_b", (D, cfg.o_groups * cfg.o_lora_rank // WORLD))
        man[f"{p}.ffn.gate.weight"] = ExpectedTensor((E, D), BF16)
        if li < cfg.n_hash_layers:
            man[f"{p}.ffn.gate.tid2eid"] = ExpectedTensor(
                (V, cfg.n_activated_experts), INT
            )
        else:
            man[f"{p}.ffn.gate.bias"] = ExpectedTensor((E,), F32)
        _fp8(man, f"{p}.ffn.shared_experts.w1", (cfg.moe_inter_dim, D))
        _fp8(man, f"{p}.ffn.shared_experts.w2", (D, cfg.moe_inter_dim))
        _fp8(man, f"{p}.ffn.shared_experts.w3", (cfg.moe_inter_dim, D))
        for le in range(E_loc):
            ge = rank * E_loc + le
            _fp4(man, f"{p}.ffn.experts.{ge}.w1", (cfg.moe_inter_dim, D))
            _fp4(man, f"{p}.ffn.experts.{ge}.w2", (D, cfg.moe_inter_dim))
            _fp4(man, f"{p}.ffn.experts.{ge}.w3", (cfg.moe_inter_dim, D))
        if ratio > 0:
            coff = 2 if ratio == 4 else 1
            cp = f"{p}.attn.compressor"
            man[f"{cp}.ape"] = ExpectedTensor((ratio, coff * hd), F32)
            man[f"{cp}.wkv.weight"] = ExpectedTensor((coff * hd, D), BF16)
            man[f"{cp}.wgate.weight"] = ExpectedTensor((coff * hd, D), BF16)
            man[f"{cp}.norm.weight"] = ExpectedTensor((hd,), BF16)
        if ratio == 4:
            ihd = cfg.index_head_dim
            ip = f"{p}.attn.indexer"
            _fp8(man, f"{ip}.wq_b",
                 (cfg.index_n_heads * ihd // WORLD, cfg.q_lora_rank))
            man[f"{ip}.weights_proj.weight"] = ExpectedTensor(
                (cfg.index_n_heads // WORLD, D), BF16
            )
            icp = f"{ip}.compressor"
            man[f"{icp}.ape"] = ExpectedTensor((ratio, 2 * ihd), F32)
            man[f"{icp}.wkv.weight"] = ExpectedTensor((2 * ihd, D), BF16)
            man[f"{icp}.wgate.weight"] = ExpectedTensor((2 * ihd, D), BF16)
            man[f"{icp}.norm.weight"] = ExpectedTensor((ihd,), BF16)
    return man


# replicated tensors cheap enough to byte-compare across all ranks
_DEEP_KEYS = ("norm.weight", "hc_head_fn", "hc_head_base", "hc_head_scale")


def validate_checkpoint(cfg: DSv4Config, model_path: str,
                        deep: bool = False) -> List[str]:
    """Validate all 8 rank files against the expected manifest. Returns a
    list of human-readable problems (empty = checkpoint is loadable)."""
    import os

    from pegainfer_tpu.models.dsv4_weights import SafetensorsReader, _rank_files

    errors: List[str] = []
    readers = []
    for rank, path in enumerate(_rank_files(model_path)):
        if not os.path.exists(path):
            errors.append(f"rank {rank}: missing file {path}")
            continue
        readers.append((rank, SafetensorsReader(path)))

    for rank, r in readers:
        man = expected_rank_manifest(cfg, rank)
        seen = set(r.keys())
        for name in sorted(set(man) - seen):
            errors.append(f"rank {rank}: missing tensor {name}")
        for name in sorted(seen - set(man)):
            errors.append(f"rank {rank}: unexpected tensor {name}")
        for name in sorted(seen & set(man)):
            info = r._header[name]
            man[name].check(f"rank {rank}: {name}", tuple(info["shape"]),
                            info["dtype"], errors)

    if deep and len(readers) == WORLD and not errors:
        import numpy as np

        for name in _DEEP_KEYS:
            ref = np.asarray(readers[0][1][name])
            for rank, r in readers[1:]:
                if not np.array_equal(np.asarray(r[name]), ref):
                    errors.append(
                        f"rank {rank}: replicated tensor {name} differs from rank 0"
                    )
    return errors
