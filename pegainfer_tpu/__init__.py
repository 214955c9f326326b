"""pegainfer-tpu: a TPU-native LLM inference engine.

A from-scratch JAX/XLA/Pallas serving stack with the capability set of the
pegainfer reference engine (Rust+CUDA): continuous batching, paged KV cache
with admission control, bucketed jitted decode steps, on-device sampling,
GSPMD tensor parallelism, and an OpenAI-compatible streaming HTTP API.

Reference parity map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from pegainfer_tpu.engine.contract import (  # noqa: F401
    EngineHandle,
    EngineLoadOptions,
    FinishReason,
    GenerateRequest,
    SamplingParams,
    TokenChannel,
    TokenEvent,
    TokenLogprob,
)
