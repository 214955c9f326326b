"""Compute ops: XLA reference implementations + Pallas TPU fast paths.

Kernel ledger (reference: pegainfer-kernels/KERNELS.md) — op → impl:

| op | XLA reference | Pallas fast path |
|---|---|---|
| rms_norm / fused_add_rms_norm | ops.norm | (XLA fuses; no kernel needed) |
| rope + qk-norm | ops.rope | fused into attention prep (XLA) |
| paged attention decode | ops.attention.paged_attention_decode | ops.pallas.paged_attention |
| ragged prefill attention | ops.attention.prefill_attention | ops.pallas.flash_prefill |
| sampling (greedy/temp/top-k/top-p) | ops.sampling | (XLA) |
| SwiGLU MLP | inline in models (XLA fuses) | — |
"""
