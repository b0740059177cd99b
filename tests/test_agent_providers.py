"""Schema-level tests for the real image-edit provider clients against
canned responses (reference wire formats, src/utils/image_generation.py:
gemini :319-438, qwen :167-242, doubao :244-317, openai :439-632)."""
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest
from PIL import Image

from video_styler_tpu.agent import providers as P


def _png_bytes(color=(255, 0, 0), size=(8, 8)):
    img = Image.new("RGB", size, color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


RESULT_PNG = _png_bytes((0, 255, 0))
RESULT_B64 = base64.b64encode(RESULT_PNG).decode()


class _Server:
    """Captures the last request and returns a canned JSON response."""

    def __init__(self, response, status=200):
        self.response = response
        self.status = status
        self.requests = []
        outer = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                outer.requests.append({
                    "path": self.path,
                    "headers": dict(self.headers),
                    "body": body,
                })
                resp = outer.response
                if callable(resp):
                    resp = resp(self.path)
                body = json.dumps(resp).encode()
                self.send_response(outer.status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                outer.requests.append({"path": self.path, "headers": {},
                                       "body": b""})
                self.send_response(200)
                self.send_header("Content-Length", str(len(RESULT_PNG)))
                self.end_headers()
                self.wfile.write(RESULT_PNG)

        self.server = HTTPServer(("127.0.0.1", 0), H)
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()
        self.endpoint = f"http://127.0.0.1:{self.server.server_port}"

    def stop(self):
        self.server.shutdown()


@pytest.fixture()
def img():
    return Image.new("RGB", (16, 9), (10, 20, 30))


def test_gemini_schema(img, monkeypatch):
    srv = _Server({"candidates": [{"finishReason": "STOP", "content": {
        "parts": [{"inlineData": {"mimeType": "image/png",
                                  "data": RESULT_B64}}]}}]})
    monkeypatch.setenv("GEMINI_API_KEY", "k")
    monkeypatch.setenv("GEMINI_API_ENDPOINT", srv.endpoint)
    out = P.gemini_edit(img, "make it van gogh", target_ratio=16 / 9)
    assert out.size == (8, 8)
    req = srv.requests[0]
    assert ":generateContent" in req["path"]
    hdrs = {k.lower(): v for k, v in req["headers"].items()}
    assert hdrs.get("x-goog-api-key") == "k"
    body = json.loads(req["body"])
    parts = body["contents"][0]["parts"]
    assert parts[0]["inline_data"]["mime_type"] == "image/png"
    assert parts[1]["text"] == "make it van gogh"
    # ratio snapped to the reference's valid set
    assert body["generationConfig"]["imageConfig"]["aspectRatio"] == "16:9"
    assert body["generationConfig"]["candidateCount"] == 1
    srv.stop()


def test_gemini_non_stop_finish_raises(img, monkeypatch):
    srv = _Server({"candidates": [{"finishReason": "SAFETY"}]})
    monkeypatch.setenv("GEMINI_API_KEY", "k")
    monkeypatch.setenv("GEMINI_API_ENDPOINT", srv.endpoint)
    with pytest.raises(RuntimeError, match="SAFETY"):
        P.gemini_edit(img, "x")
    srv.stop()


def test_qwen_schema(img, monkeypatch):
    srv = _Server({"output": {"choices": [{"message": {"content": [
        {"image": f"data:image/png;base64,{RESULT_B64}"}]}}]}})
    monkeypatch.setenv("DASHSCOPE_API_KEY", "dk")
    monkeypatch.setenv("DASHSCOPE_API_ENDPOINT", srv.endpoint)
    out = P.qwen_edit(img, "sketch style")
    assert out.size == (8, 8)
    req = srv.requests[0]
    assert req["path"].endswith("/multimodal-generation/generation")
    assert req["headers"].get("Authorization") == "Bearer dk"
    body = json.loads(req["body"])
    assert body["model"] == "qwen-image-edit"
    content = body["input"]["messages"][0]["content"]
    assert content[0]["image"].startswith("data:image/png;base64,")
    assert content[1]["text"] == "sketch style"
    # reference disables watermark and passes a blank negative prompt
    assert body["parameters"] == {"watermark": False, "negative_prompt": " "}
    srv.stop()


def test_qwen_url_result_downloaded(img, monkeypatch):
    srv = _Server(lambda path: {"output": {"choices": [{"message": {
        "content": [{"image": f"{srv.endpoint}/result.png"}]}}]}})
    monkeypatch.setenv("DASHSCOPE_API_KEY", "dk")
    monkeypatch.setenv("DASHSCOPE_API_ENDPOINT", srv.endpoint)
    out = P.qwen_edit(img, "s")
    assert out.size == (8, 8)
    assert any(r["path"] == "/result.png" for r in srv.requests)
    srv.stop()


def test_doubao_schema_and_ratio_snap(img, monkeypatch):
    srv = _Server(lambda path: {"data": [{"url": f"{srv.endpoint}/r.png"}]})
    monkeypatch.setenv("ARK_IMAGE_API_KEY", "ak")
    monkeypatch.setenv("ARK_API_ENDPOINT", srv.endpoint)
    out = P.doubao_edit(img, "style", target_ratio=16 / 9)
    assert out.size == (8, 8)
    req = srv.requests[0]
    assert req["path"] == "/api/v3/images/generations"
    body = json.loads(req["body"])
    # reference Ark size table: 16:9 -> 2560x1440 (image_generation.py:266)
    assert body["size"] == "2560x1440"
    assert body["response_format"] == "url"
    assert body["sequential_image_generation"] == "disabled"
    assert body["watermark"] is False
    assert body["image"][0].startswith("data:image/png;base64,")
    srv.stop()


def test_openai_edit_multipart(img, monkeypatch):
    srv = _Server({"data": [{"b64_json": RESULT_B64}]})
    monkeypatch.setenv("AZURE_API_KEY", "zk")
    monkeypatch.setenv("AZURE_ENDPOINT", srv.endpoint)
    out = P.openai_edit(img, "style it. ", target_ratio=1.5)
    assert out.size == (8, 8)
    req = srv.requests[0]
    assert req["path"] == "/images/edits"
    ctype = req["headers"]["Content-Type"]
    assert ctype.startswith("multipart/form-data; boundary=")
    body = req["body"]
    # multipart carries the file, the snapped size, and the reference's
    # structure-preservation prompt suffix (image_generation.py:553)
    assert b'name="image"; filename="image.png"' in body
    assert b"1536x1024" in body
    assert P.OPENAI_EDIT_SUFFIX.encode() in body
    assert b'name="input_fidelity"\r\n\r\nhigh' in body
    srv.stop()


def test_openai_text_only_uses_generations(monkeypatch):
    srv = _Server({"data": [{"b64_json": RESULT_B64}]})
    monkeypatch.setenv("AZURE_API_KEY", "zk")
    monkeypatch.setenv("AZURE_ENDPOINT", srv.endpoint)
    out = P.openai_edit(None, "a cat", target_ratio=1.0)
    assert out.size == (8, 8)
    req = srv.requests[0]
    assert req["path"] == "/images/generations"
    body = json.loads(req["body"])
    assert body["size"] == "1024x1024" and body["n"] == 1
    srv.stop()


def test_missing_key_is_non_retryable(img, monkeypatch):
    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    with pytest.raises(P.NonRetryableError):
        P.gemini_edit(img, "x")


def test_retryability_classification():
    import urllib.error
    assert P.is_retryable_error(RuntimeError("HTTP 500 from x: oops"))
    assert P.is_retryable_error(RuntimeError("status=429 rate limit"))
    assert not P.is_retryable_error(RuntimeError("HTTP 401 from x: denied"))
    assert not P.is_retryable_error(P.NonRetryableError("bad key"))
    assert P.is_retryable_error(urllib.error.URLError("timed out"))


def test_tool_routes_provider_and_no_retry_on_auth(img, monkeypatch):
    """image_generation_tool + retry_with_backoff: a 4xx-class error must
    NOT be retried (reference _is_retryable_error, :36-78)."""
    from video_styler_tpu.agent.image_generation import image_generation_tool
    calls = {"n": 0}

    def fail(*a, **k):
        calls["n"] += 1
        raise P.NonRetryableError("401 denied")

    monkeypatch.setitem(
        __import__("video_styler_tpu.agent.image_generation",
                   fromlist=["PROVIDERS"]).PROVIDERS, "gemini", fail)
    with pytest.raises(P.NonRetryableError):
        image_generation_tool(img, "x", provider="gemini", max_retries=3)
    assert calls["n"] == 1


def test_http_4xx_maps_to_non_retryable(img, monkeypatch):
    srv = _Server({"error": "bad"}, status=400)
    monkeypatch.setenv("DASHSCOPE_API_KEY", "dk")
    monkeypatch.setenv("DASHSCOPE_API_ENDPOINT", srv.endpoint)
    with pytest.raises(P.NonRetryableError):
        P.qwen_edit(img, "x")
    srv.stop()
