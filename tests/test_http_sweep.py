"""bench/http_sweep client vs the sim-engine HTTP stack (reference analog:
tests/test_bench_http_serving.py — the benchmark client itself is tested)."""

import asyncio

from aiohttp.test_utils import TestClient, TestServer

from pegainfer_tpu.bench.http_sweep import sweep_level
from pegainfer_tpu.server.api import OpenAIApp
from pegainfer_tpu.server.tokenizer import SimTokenizer
from pegainfer_tpu.sim import SimulatedEngineConfig, start_engine


def test_sweep_level_against_sim_server():
    async def body():
        engine = start_engine(SimulatedEngineConfig(ttft_s=0.001, tpot_s=0.0005))
        app = OpenAIApp(engine, SimTokenizer(), "sim").build()
        server = TestServer(app)
        await server.start_server()
        base = f"http://{server.host}:{server.port}"
        try:
            level = await sweep_level(base, concurrency=3, n_requests=6,
                                      prompt="a b c d", max_tokens=5)
            assert level["errors"] == 0
            assert level["qps"] > 0
            assert level["ttft_ms"]["p50"] > 0
            assert len(level["output_hashes"]) == 1  # deterministic outputs
        finally:
            await server.close()
            engine.shutdown()

    asyncio.new_event_loop().run_until_complete(body())
