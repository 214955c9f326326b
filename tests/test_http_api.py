"""OpenAI HTTP frontend over the simulated engine (CPU-only).

Reference parity: the pegainfer-sim + vllm-frontend test loop
(pegainfer-sim/src/lib.rs:10-73,
docs/subsystems/frontend/simulated-inference-engine.md) — the full HTTP →
tokenize → scheduler → TokenEvent → SSE path without accelerator hardware.
"""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from pegainfer_tpu.server.api import OpenAIApp
from pegainfer_tpu.server.tokenizer import SimTokenizer
from pegainfer_tpu.sim import SimulatedEngineConfig, start_engine


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


async def make_client(**sim_kw):
    engine = start_engine(SimulatedEngineConfig(**sim_kw))
    app = OpenAIApp(engine, SimTokenizer(), "sim-model").build()
    client = TestClient(TestServer(app))
    await client.start_server()
    return client, engine


async def close(client, engine):
    await client.close()
    engine.shutdown()


def test_health_and_models():
    async def body():
        client, engine = await make_client()
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "sim-model"
        await close(client, engine)

    run(body())


def test_completion_blocking():
    async def body():
        client, engine = await make_client()
        r = await client.post(
            "/v1/completions",
            json={"prompt": "hello world test", "max_tokens": 8},
        )
        assert r.status == 200
        data = await r.json()
        assert data["object"] == "text_completion"
        ch = data["choices"][0]
        assert ch["finish_reason"] == "length"
        assert len(ch["text"].split()) == 8
        assert data["usage"]["completion_tokens"] == 8
        assert data["usage"]["prompt_tokens"] == 3
        await close(client, engine)

    run(body())


def test_completion_token_prompt_and_determinism():
    async def body():
        client, engine = await make_client()
        r1 = await client.post(
            "/v1/completions", json={"prompt": [5, 6, 7], "max_tokens": 4}
        )
        r2 = await client.post(
            "/v1/completions", json={"prompt": [5, 6, 7], "max_tokens": 4}
        )
        t1 = (await r1.json())["choices"][0]["text"]
        t2 = (await r2.json())["choices"][0]["text"]
        assert t1 == t2
        await close(client, engine)

    run(body())


def test_completion_streaming_sse():
    async def body():
        client, engine = await make_client()
        r = await client.post(
            "/v1/completions",
            json={
                "prompt": "streaming please",
                "max_tokens": 5,
                "stream": True,
                "stream_options": {"include_usage": True},
            },
        )
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = (await r.read()).decode()
        events = [
            json.loads(line[len("data: "):])
            for line in raw.strip().split("\n\n")
            if line.startswith("data: ") and line != "data: [DONE]"
        ]
        assert raw.strip().endswith("data: [DONE]")
        text = "".join(e["choices"][0]["text"] for e in events if e.get("choices"))
        assert len(text.split()) == 5
        finishes = [
            e["choices"][0]["finish_reason"] for e in events if e.get("choices")
        ]
        assert finishes[-1] == "length"
        usage = [e for e in events if "usage" in e and e["usage"]]
        assert usage and usage[-1]["usage"]["completion_tokens"] == 5
        await close(client, engine)

    run(body())


def test_chat_completion():
    async def body():
        client, engine = await make_client()
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hi there"}],
                "max_tokens": 6,
            },
        )
        data = await r.json()
        assert data["object"] == "chat.completion"
        msg = data["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert len(msg["content"].split()) == 6
        await close(client, engine)

    run(body())


def test_chat_streaming():
    async def body():
        client, engine = await make_client()
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "stream me"}],
                "max_tokens": 4,
                "stream": True,
            },
        )
        raw = (await r.read()).decode()
        events = [
            json.loads(line[len("data: "):])
            for line in raw.strip().split("\n\n")
            if line.startswith("data: ") and line != "data: [DONE]"
        ]
        assert events[0]["choices"][0]["delta"].get("role") == "assistant"
        content = "".join(
            e["choices"][0]["delta"].get("content", "")
            for e in events
            if e.get("choices")
        )
        assert len(content.split()) == 4
        await close(client, engine)

    run(body())


def test_stop_string_cuts_generation():
    async def body():
        client, engine = await make_client()
        # sim emits "tokN tokN+1 ..."; find the 2nd token's text to stop on
        r = await client.post(
            "/v1/completions", json={"prompt": [10, 20], "max_tokens": 6}
        )
        full = (await r.json())["choices"][0]["text"]
        words = full.split()
        stop_word = words[2]
        r = await client.post(
            "/v1/completions",
            json={"prompt": [10, 20], "max_tokens": 6, "stop": stop_word},
        )
        data = await r.json()
        assert data["choices"][0]["finish_reason"] == "stop"
        assert stop_word not in data["choices"][0]["text"]
        await close(client, engine)

    run(body())


def test_bad_requests():
    async def body():
        client, engine = await make_client()
        r = await client.post("/v1/completions", json={"max_tokens": 4})
        assert r.status == 400
        r = await client.post("/v1/chat/completions", json={})
        assert r.status == 400
        await close(client, engine)

    run(body())


def test_rejected_too_long_maps_to_400():
    async def body():
        client, engine = await make_client(num_pages=4, page_size=4)
        r = await client.post(
            "/v1/completions",
            json={"prompt": list(range(100)), "max_tokens": 50},
        )
        assert r.status == 400
        data = await r.json()
        assert "KV pages" in data["error"]["message"]
        await close(client, engine)

    run(body())


def test_completion_multi_prompt_batch():
    async def body():
        client, engine = await make_client()
        r = await client.post(
            "/v1/completions",
            json={"prompt": ["one two", "three four five"], "max_tokens": 4},
        )
        data = await r.json()
        assert [c["index"] for c in data["choices"]] == [0, 1]
        assert all(len(c["text"].split()) == 4 for c in data["choices"])
        assert data["usage"]["prompt_tokens"] == 5
        await close(client, engine)

    run(body())


def test_metrics_endpoint_counts():
    async def body():
        client, engine = await make_client()
        await client.post("/v1/completions",
                          json={"prompt": "a b", "max_tokens": 3})
        r = await client.get("/metrics")
        m = await r.json()
        assert m["requests_total"] >= 1
        assert m["completion_tokens_total"] >= 3
        await close(client, engine)

    run(body())
