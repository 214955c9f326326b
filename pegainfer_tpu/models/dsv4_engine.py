"""DeepSeek-V4 engine: ModelRuntime wiring + startup.

Reference analog: the DSv4 "direct" engine (deepseek-v4/src/direct/
scheduler.rs — serial prefill + small-batch decode, greedy only). Here the
generic continuous-batching executor drives it; DSv4 has no paged KV (fixed
per-slot window ring + compressed rows), so the page accounting degenerates:
page_size=1 and per-request page budget = max_model_len, making admission
effectively slot-bound.
"""

from __future__ import annotations

import json
import logging
import os

import jax
from typing import Optional

import jax.numpy as jnp

from pegainfer_tpu.engine.contract import EngineHandle, EngineLoadOptions
from pegainfer_tpu.engine.jax_executor import JaxExecutor, ModelRuntime
from pegainfer_tpu.engine.scheduler import start_scheduler
from pegainfer_tpu.models import dsv4

log = logging.getLogger("pegainfer.dsv4")


def probe_model(model_path: str) -> bool:
    try:
        with open(os.path.join(model_path, "config.json")) as f:
            c = json.load(f)
    except OSError:
        return False
    return c.get("model_type") == "deepseek_v4"


def max_blocks_for(cfg: dsv4.DSv4Config, max_model_len: int) -> int:
    ratios = [r for r in cfg.compress_ratios if r > 0]
    if not ratios:
        return 1
    return -(-max_model_len // min(ratios))


def make_runtime(cfg: dsv4.DSv4Config, params, max_model_len: int = 4096,
                 max_slots: int = 2, state_dtype=jnp.bfloat16,
                 mesh=None,
                 modes: "dsv4.RunModes | None" = None) -> ModelRuntime:
    """DSv4 runtime over the generic executor contract. Page args are
    ignored (no paged KV); slot args select the per-request caches.

    Layers run segment-scanned (dsv4.decode_grouped/prefill_grouped): one
    traced layer body per same-signature run instead of 43 unrolled layers.

    ``params`` may be per-layer (grouped here) or already grouped —
    the shard-wise loader (dsv4_weights.load_params_sharded) returns the
    grouped layout directly so no leaf ever materializes unsharded. With
    ``mesh``, the decode caches are placed replicated over it (MQA: every
    shard holds the joint KV, like each reference rank does).
    """
    gparams = (params if "segments" in params
               else dsv4.group_params(cfg, params))
    gstate = dsv4.group_state(cfg, dsv4.make_state(
        cfg, max_slots, max_blocks_for(cfg, max_model_len), dtype=state_dtype
    ))
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from pegainfer_tpu.parallel.sharding import place_tree

        gstate = place_tree(mesh, gstate, {"segments": [
            {k: P() for k in seg} for seg in gstate["segments"]
        ]})

    # engine-owned run modes threaded into every traced fn (NOT the module
    # globals — two engines with different modes coexist in one process).
    # modes=None keeps the legacy trace-time global fallback (set_* helpers).
    rmodes = modes

    def prefill_fn(params_, state_, tokens, seq_len, page_table, slot):
        logits, state_ = dsv4.prefill_grouped(cfg, params_, tokens,
                                              gstate=state_, slot=slot,
                                              seq_len=seq_len, modes=rmodes)
        return state_, logits[seq_len - 1], None

    def prefill_all_fn(params_, state_, tokens, seq_len, page_table, slot):
        logits, state_ = dsv4.prefill_grouped(cfg, params_, tokens,
                                              gstate=state_, slot=slot,
                                              seq_len=seq_len, modes=rmodes)
        return state_, logits[seq_len - 1], logits

    def decode_fn(params_, state_, tokens, positions, tables, seq_lens, slots):
        return dsv4.decode_grouped(cfg, params_, state_, tokens, positions,
                                   slots, modes=rmodes)

    def prefill_resume_fn(params_, state_, tokens, start_pos, valid, slot):
        # slot prefix cache: suffix continuation through the decode
        # recurrence; dead slot = row max_slots (dsv4.make_state)
        return dsv4.prefill_resume_grouped(
            cfg, params_, state_, tokens, start_pos, valid, slot,
            dead_slot=max_slots, modes=rmodes,
        )

    # one slot-cache snapshot = one slot's rows across every grouped leaf
    # (dsv4.slot_export slices axis 1 of [n_layers_seg, S, ...]) — the
    # executor budgets the SlotPrefixCache cap against free HBM with this
    snap_bytes = sum(
        leaf.size // leaf.shape[1] * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(gstate)
    )

    return ModelRuntime(
        prefill_fn=prefill_fn,
        prefill_all_logits_fn=prefill_all_fn,
        decode_fn=decode_fn,
        params=gparams,
        state=gstate,
        slot_snapshot_bytes=snap_bytes,
        page_size=1,
        num_pages=max_model_len * max_slots + 2,
        stop_token_ids=frozenset({cfg.eos_token_id}),
        max_model_len=max_model_len,
        vocab_size=cfg.vocab_size,
        max_slots=max_slots,
        # PD handoff (engine/pd.py): DSv4 has no pages — the slot rows are
        # the whole payload. The same export/import powers the slot prefix
        # cache (kv.SlotPrefixCache + prefill_resume_fn).
        slot_export_fn=dsv4.slot_export,
        slot_import_fn=dsv4.slot_import,
        prefill_resume_fn=prefill_resume_fn,
    )


def resolve_tp_size(tp_size: Optional[int], n_devices: int) -> int:
    """MP8 world sizing: honor an explicit --tp-size; default to the
    largest divisor of 8 the host's devices allow (the reference is a
    fixed world_size=8, deepseek-v4/src/config.rs:23-80 — sub-8 worlds
    here fold 8/n checkpoint ranks per device)."""
    if tp_size and tp_size > 0:
        if tp_size not in (1, 2, 4, 8):
            raise ValueError(f"DSv4 tp_size must divide mp8 world 8, got {tp_size}")
        if tp_size > n_devices:
            raise ValueError(f"tp_size={tp_size} but only {n_devices} devices")
        return tp_size
    for n in (8, 4, 2):
        if n_devices >= n:
            return n
    return 1


def start_engine(
    model_path: str,
    options: Optional[EngineLoadOptions] = None,
    tp_size: Optional[int] = None,
) -> EngineHandle:
    opts = options or EngineLoadOptions()
    cfg = dsv4.DSv4Config.from_model_path(model_path)
    log.info("loading DeepSeek-V4 (%d layers, dim %d)", cfg.n_layers, cfg.dim)

    # quantize=None serves the checkpoint's own dtypes — FP8/FP4 resident in
    # HBM with on-the-fly dequant, like the reference (model.rs fp8_linear/
    # fp4_linear). quantize="bf16" dequantizes at load (numerics oracle).
    resident = opts.quantize != "bf16"
    tp = resolve_tp_size(tp_size, len(jax.devices()))
    # int8-experts compatibility is knowable from opts alone — fail/warn
    # BEFORE streaming a potentially ~0.7 TB checkpoint (ADVICE r4 +
    # round-5 review: the guard used to run after the full load)
    experts_fmt = os.environ.get("PEGAINFER_DSV4_EXPERTS", "")
    if opts.quantize == "int8-experts":
        experts_fmt = "int8"
    if experts_fmt == "int8" and (not resident or tp > 1):
        why = ("requires resident (non-bf16) weights" if not resident
               else "not supported under a multichip mesh")
        if opts.quantize == "int8-experts":
            raise ValueError(f"quantize='int8-experts' {why}")
        log.warning("PEGAINFER_DSV4_EXPERTS=int8 ignored: %s — serving %s",
                    why, "fp8/fp4 resident" if resident else "bf16")
        experts_fmt = ""
    mesh = None
    if tp > 1:
        # MP8 GSPMD mesh (reference: 8 persistent rank workers,
        # direct/worker.rs:38-110). Shard-wise load: each tensor is read
        # per rank file and committed straight at its mesh position — a
        # real 671B (~0.7 TB resident) loads at ≈ total/tp per device.
        import numpy as np
        from jax.sharding import Mesh

        from pegainfer_tpu.models.dsv4_weights import load_params_sharded

        mesh = Mesh(np.asarray(jax.devices()[:tp]), ("tp",))
        params = load_params_sharded(cfg, model_path, mesh,
                                     resident=resident)
    else:
        from pegainfer_tpu.models.dsv4_weights import load_params

        params = load_params(cfg, model_path, resident=resident)
    # int8-expert SPEED mode (PEGAINFER_DSV4_EXPERTS=int8 or
    # quantize="int8-experts"): requantize the routed expert stacks from
    # fp4 to int8 per-output-channel at load — 2× the expert bytes but
    # streamed several× faster by the int8 Pallas kernels (the fp4 GEMV
    # is VPU-decode-bound; ops/pallas/fp4_gemm.py int8 section).
    if resident and experts_fmt == "int8" and mesh is None:
        import numpy as np

        from pegainfer_tpu.ops import quant

        for lw in params["layers"]:
            for k in dsv4.FP4_KEYS:
                if k in lw and quant.is_quantized(lw[k]):
                    w = np.asarray(quant.dequant_any(lw[k], jnp.float32))
                    lw[k] = quant.quantize_int8_stack(w)
        log.info("DSv4 experts requantized to int8 per-output-channel "
                 "(speed mode)")
    log.info("DSv4 params HBM footprint: %.2f GiB total over %d devices (%s)",
             dsv4.params_hbm_bytes(params) / 2**30, tp,
             "fp8/fp4 resident" if resident else "bf16")
    # Fused FP4 dequant-GEMV for the decode routed experts (ops/pallas/
    # fp4_gemm.py): single-device TPU serving with resident weights.
    # PEGAINFER_DSV4_FP4_KERNEL=0/1 overrides for A/B measurement.
    env_k = os.environ.get("PEGAINFER_DSV4_FP4_KERNEL")
    use_fp4_kernel = (
        env_k == "1" or (
            env_k != "0" and mesh is None and resident
            and jax.default_backend() == "tpu"
        )
    )
    if use_fp4_kernel:
        log.info("DSv4 decode: fused Pallas FP4 expert + FP8 linear "
                 "dequant-GEMVs enabled")
    ep = resolve_moe_ep(cfg, mesh=mesh)
    modes = dsv4.RunModes(fp4_kernel=use_fp4_kernel,
                          fp8_kernel=use_fp4_kernel, moe_ep=ep)
    max_slots = min(opts.max_batch_size, 2)  # reference serves bs<=2
    runtime = make_runtime(
        cfg, params,
        max_model_len=opts.max_model_len or 4096,
        max_slots=max_slots,
        mesh=mesh,
        modes=modes,
    )
    if ep is not None and mesh is None:
        # engine didn't build a sharded mesh itself: place params/state
        # with the MP8 shard specs over the EP mesh
        from pegainfer_tpu.parallel.sharding import shard_dsv4_grouped

        runtime.params, runtime.state = shard_dsv4_grouped(
            ep[0], runtime.params, runtime.state
        )
    executor = JaxExecutor(runtime, opts)
    return start_scheduler(executor, seed=opts.seed)


def resolve_moe_ep(cfg: dsv4.DSv4Config, mode: Optional[str] = None,
                   mesh=None) -> Optional[tuple]:
    """Expert-parallel MoE config (reference: PEGAINFER_DSV4_PPLX env
    enabling the pplx-ep RDMA a2a path, direct/pplx_bootstrap.rs).

    ``PEGAINFER_DSV4_EP=ragged|dense|1`` ships prefill-scale MoE tokens to
    their experts' shards over a mesh of all local devices via
    lax.ragged_all_to_all (ops/moe_ep.moe_ep_a2a); "dense" uses the fixed-
    block lax.all_to_all transport (the CPU-testable oracle). Returns the
    RunModes.moe_ep tuple (mesh, axis, transport), or None when unset."""
    mode = mode or os.environ.get("PEGAINFER_DSV4_EP")
    if not mode:
        return None
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs, ("tp",))
    n = mesh.shape["tp"]
    if cfg.n_routed_experts % n:
        raise ValueError(
            f"PEGAINFER_DSV4_EP: {cfg.n_routed_experts} experts not "
            f"divisible by {n} devices"
        )
    transport = "dense" if mode == "dense" else "ragged"
    log.info("DSv4 expert-parallel MoE on %d devices (%s transport)",
             n, transport)
    return (mesh, "tp", transport)


def maybe_enable_moe_ep(cfg: dsv4.DSv4Config, runtime: ModelRuntime,
                        mode: Optional[str] = None, mesh=None) -> bool:
    """Legacy module-global form of resolve_moe_ep (scripts/tests that
    build a runtime first and flip the EP switch after): sets the module
    default so runtimes built with modes=None pick it up at trace time,
    and places params/state over the mesh."""
    from pegainfer_tpu.parallel.sharding import shard_dsv4_grouped

    ep = resolve_moe_ep(cfg, mode=mode, mesh=mesh)
    if ep is None:
        return False
    place = mesh is None  # engine-built mesh → params already shard-wise
    dsv4.set_moe_ep(ep[0], ep[1], ep[2])
    if place:
        runtime.params, runtime.state = shard_dsv4_grouped(
            ep[0], runtime.params, runtime.state
        )
    return True
