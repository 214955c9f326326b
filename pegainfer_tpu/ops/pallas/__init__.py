"""Pallas TPU kernels — the hot compute paths.

Kernel ledger (reference analog: pegainfer-kernels/KERNELS.md):

| op | Pallas kernel | XLA fallback | reference kernel |
|---|---|---|---|
| causal prefill attention | flash_prefill.flash_prefill | ops.attention.prefill_attention | batch_prefill_paged_cuda (csrc/paged_attention.cu) |
| paged GQA decode attention | paged_decode.paged_attention_decode | ops.attention.paged_attention_decode | paged_attention_decode_cuda / _split_kv (csrc/paged_attention.cu) |

Each kernel has an ``interpret=`` switch so the CPU test suite runs the same
code path the TPU compiles (tests/test_pallas_*.py verify vs the XLA
reference implementations).
"""

from pegainfer_tpu.ops.pallas.flash_prefill import flash_attention, flash_prefill  # noqa: F401
from pegainfer_tpu.ops.pallas.paged_decode import paged_attention_decode  # noqa: F401
