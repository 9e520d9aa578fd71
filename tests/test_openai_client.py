"""OpenAIClient against an in-process mock OpenAI-compatible server.

The mock wraps the deterministic ``VocabStubModel`` behind real HTTP
(``/completions`` + ``/chat/completions`` with OpenAI response shapes), so
``model_kind="openai"`` exercises the full network path — JSON encode,
auth header, retry on 429, rate limiting, response parse — and must yield
byte-identical detections to calling the stub directly.  Reference parity:
``models.py:10-52`` (client), ``run.py:41-42`` (the sleep loop the token
bucket replaces).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


def _make_handler(stub, state):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # silence request logging
            pass

        def do_POST(self):
            state["requests"] += 1
            if state["fail_first"] > 0:
                state["fail_first"] -= 1
                self.send_response(429)
                self.send_header("Retry-After", "0")
                self.end_headers()
                return
            if self.headers.get("Authorization") != "Bearer test-key":
                self.send_response(401)
                self.end_headers()
                return
            length = int(self.headers["Content-Length"])
            payload = json.loads(self.rfile.read(length))
            if self.path.endswith("/chat/completions"):
                chat = [
                    (m["content"], m["role"]) for m in payload["messages"]
                ]
                text = stub.generate([chat])[0]
                body = {"choices": [{"message": {"content": text}}]}
            else:
                text = stub.generate([payload["prompt"]])[0]
                body = {"choices": [{"text": text}]}
            out = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    return Handler


@pytest.fixture()
def mock_server():
    from promptner_ray.model import VocabStubModel
    from promptner_ray.synth import TASK_VOCABS

    stub = VocabStubModel(TASK_VOCABS["conll"])
    state = {"requests": 0, "fail_first": 0}
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(stub, state)
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base_url = f"http://127.0.0.1:{server.server_address[1]}/v1"
    yield base_url, state, stub
    server.shutdown()
    thread.join(timeout=5)


def test_completion_roundtrip_matches_stub(mock_server):
    from promptner_ray.configs import make_task_spec
    from promptner_ray.model import make_model

    base_url, state, stub = mock_server
    client = make_model("openai", base_url=base_url, api_key="test-key")
    spec = make_task_spec(task="conll")
    sent = "John Smith visited Paris on Tuesday"
    prompt = spec.prompt.render_completion(sent)
    assert client.generate([prompt]) == stub.generate([prompt])


def test_lazy_completion_prompt_materialized(mock_server):
    """CompletionPrompt objects are sent as their rendered .text."""
    from promptner_ray.configs import make_task_spec
    from promptner_ray.model import make_model

    base_url, _, stub = mock_server
    client = make_model("openai", base_url=base_url, api_key="test-key")
    spec = make_task_spec(task="conll")
    lazy = spec.prompt.render_completion_lazy("John Smith visited Paris")
    assert client.generate([lazy]) == stub.generate([lazy.text])


def test_chat_roundtrip_matches_stub(mock_server):
    from promptner_ray.configs import make_task_spec
    from promptner_ray.model import make_model

    base_url, _, stub = mock_server
    client = make_model("openai", base_url=base_url, api_key="test-key")
    spec = make_task_spec(task="conll")
    chat = spec.prompt.render_chat("John Smith visited Paris")
    assert client.generate([chat]) == stub.generate([chat])


def test_retry_on_429(mock_server):
    from promptner_ray.model import make_model

    base_url, state, stub = mock_server
    state["fail_first"] = 2
    client = make_model(
        "openai", base_url=base_url, api_key="test-key", max_retries=4
    )
    out = client.generate(["not a real prompt \nAnswer:"])
    assert out == stub.generate(["not a real prompt \nAnswer:"])
    assert state["requests"] >= 3  # 2 rejected + 1 success


def test_rate_limiter_paces_requests(mock_server):
    import time

    from promptner_ray.model import make_model

    base_url, _, _ = mock_server
    # burst 1 forces serialization at ~10 req/s: 5 requests >= ~0.4 s
    client = make_model(
        "openai",
        base_url=base_url,
        api_key="test-key",
        requests_per_minute=600,
    )
    client.limiter.capacity = 1.0
    client.limiter.tokens = 1.0
    t0 = time.monotonic()
    client.generate(["p \nAnswer:"] * 5)
    assert time.monotonic() - t0 >= 0.3


def test_batch_generate_order_preserved(mock_server):
    from promptner_ray.configs import make_task_spec
    from promptner_ray.model import make_model

    base_url, _, stub = mock_server
    client = make_model("openai", base_url=base_url, api_key="test-key")
    spec = make_task_spec(task="conll")
    sents = [f"John Smith visited Paris {i} times" for i in range(12)]
    prompts = [spec.prompt.render_completion(s) for s in sents]
    assert client.generate(prompts) == stub.generate(prompts)


def test_detection_e2e_openai_matches_stub(ray_session, mock_server):
    """Ray actor-pool detection through the HTTP client == stub detection.

    Worker processes reach the driver-hosted mock over localhost — the
    same topology as actors calling a model server on the head node.
    """
    import ray

    from promptner_ray.pipelines.kg import KGConfig, detected

    base_url, _, _ = mock_server
    rows = [
        {"url": f"u{i}", "sent_id": 0, "text": f"John Smith visited Paris {i}"}
        for i in range(8)
    ]
    sents = ray.data.from_items(rows)
    via_http = detected(
        sents,
        KGConfig(
            model_kind="openai",
            model_kwargs={"base_url": base_url, "api_key": "test-key"},
            detect_concurrency=2,
        ),
    ).take_all()
    via_stub = detected(sents, KGConfig(detect_concurrency=2)).take_all()

    def key(rows_):
        return sorted(
            (r["url"], json.dumps(r["mentions"], sort_keys=True))
            for r in rows_
        )

    assert any(r["mentions"] for r in via_stub), "stub must detect mentions"
    assert key(via_http) == key(via_stub)
