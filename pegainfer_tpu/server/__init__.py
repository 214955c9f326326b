"""Serving stack: OpenAI-compatible HTTP frontend + engine startup.

TPU-native replacement for the reference's frontend chain
(pegainfer-vllm-frontend ZMQ bridge + external Rust vllm-server,
pegainfer-vllm-frontend/src/lib.rs:221-292): the engine runs in-process, so
the wire protocol disappears — the aiohttp app talks straight to the
``EngineHandle``.
"""
