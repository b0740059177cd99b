"""Download transport: resolve -> download -> cache -> load against a local
HTTP server speaking the ModelScope and HuggingFace repo APIs
(reference: diffsynth/models/downloader.py:1-111, utils/__init__.py:169-218).
"""
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import urlparse, parse_qs, unquote

import numpy as np
import pytest

from video_styler_tpu.utils.model_config import ModelConfig, register_transport
from video_styler_tpu.utils import downloader as D


REPO_FILES = {
    "diffusion_pytorch_model.safetensors": b"\x00" * 64,
    "models_t5_umt5-xxl-enc-bf16.pth": b"\x01" * 32,
    "google/umt5-xxl/spiece.model": b"SPIECE",
    "google/umt5-xxl/tokenizer_config.json": b"{}",
}


class _Handler(BaseHTTPRequestHandler):
    calls = []

    def log_message(self, *a):  # quiet
        pass

    def _send(self, body, code=200, ctype="application/octet-stream"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        _Handler.calls.append(self.path)
        u = urlparse(self.path)
        # ModelScope: file listing
        if u.path.endswith("/repo/files"):
            files = [{"Path": p, "Type": "blob"} for p in REPO_FILES]
            body = json.dumps({"Data": {"Files": files}}).encode()
            return self._send(body, ctype="application/json")
        # ModelScope: file fetch
        if u.path.endswith("/repo"):
            fp = unquote(parse_qs(u.query).get("FilePath", [""])[0])
            if fp in REPO_FILES:
                return self._send(REPO_FILES[fp])
            return self._send(b"not found", code=404)
        # HuggingFace: model info
        if u.path.startswith("/api/models/"):
            body = json.dumps({
                "siblings": [{"rfilename": p} for p in REPO_FILES]}).encode()
            return self._send(body, ctype="application/json")
        # HuggingFace: resolve/main
        if "/resolve/main/" in u.path:
            fp = unquote(u.path.split("/resolve/main/", 1)[1])
            if fp in REPO_FILES:
                return self._send(REPO_FILES[fp])
            return self._send(b"not found", code=404)
        return self._send(b"bad request", code=400)


@pytest.fixture()
def http_repo(tmp_path, monkeypatch):
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    ep = f"http://127.0.0.1:{server.server_port}"
    monkeypatch.setenv("VIDEO_STYLER_OFFLINE", "0")
    monkeypatch.setenv("VIDEO_STYLER_MODELSCOPE_ENDPOINT", ep)
    monkeypatch.setenv("VIDEO_STYLER_HF_ENDPOINT", ep)
    monkeypatch.setenv("VIDEO_STYLER_MODEL_DIR", str(tmp_path / "models"))
    _Handler.calls = []
    yield ep
    server.shutdown()


def test_modelscope_transport_glob(http_repo, tmp_path):
    got = D.modelscope_transport("Wan-AI/Wan2.1-VACE-14B",
                                 str(tmp_path / "d"), "*.safetensors")
    assert len(got) == 1 and got[0].endswith(".safetensors")
    with open(got[0], "rb") as f:
        assert f.read() == REPO_FILES["diffusion_pytorch_model.safetensors"]


def test_modelscope_transport_folder(http_repo, tmp_path):
    got = D.modelscope_transport("x/y", str(tmp_path / "d"),
                                 "google/umt5-xxl/")
    assert sorted(os.path.basename(p) for p in got) == [
        "spiece.model", "tokenizer_config.json"]


def test_huggingface_transport(http_repo, tmp_path):
    got = D.huggingface_transport("x/y", str(tmp_path / "d"), "*.pth")
    assert len(got) == 1
    with open(got[0], "rb") as f:
        assert f.read() == REPO_FILES["models_t5_umt5-xxl-enc-bf16.pth"]


def test_model_config_end_to_end_download_and_cache(http_repo):
    """ModelConfig with model_id only: lazily registers the stock transport,
    downloads, then resolves from cache on the second call with zero new
    HTTP requests (reference ignore-existing logic, utils/__init__.py:195)."""
    # force the lazy-registration path
    from video_styler_tpu.utils import model_config as MC
    MC._TRANSPORTS.pop("ModelScope", None)
    D._REGISTERED = False

    cfg = ModelConfig(model_id="Wan-AI/Wan2.1-VACE-14B",
                      origin_file_pattern="*.safetensors")
    cfg.download_if_necessary()
    assert cfg.path.endswith("diffusion_pytorch_model.safetensors")
    assert os.path.isfile(cfg.path)

    n_calls = len(_Handler.calls)
    cfg2 = ModelConfig(model_id="Wan-AI/Wan2.1-VACE-14B",
                       origin_file_pattern="*.safetensors")
    cfg2.download_if_necessary()
    assert cfg2.path == cfg.path
    assert len(_Handler.calls) == n_calls, "cache hit must not re-download"


def test_download_tokenizer_and_fetch_near_fallthrough(http_repo, tmp_path,
                                                       monkeypatch):
    """fetch_tokenizer_near falls through to the HTTP tokenizer fetch when no
    sidecar exists (the reference vendors these assets in-package,
    setup.py:28; we fetch on demand)."""
    d = D.download_tokenizer("google/umt5-xxl",
                             local_dir=str(tmp_path / "tok"),
                             files=["google/umt5-xxl/spiece.model",
                                    "google/umt5-xxl/tokenizer_config.json"])
    assert os.path.isfile(os.path.join(
        d, "google/umt5-xxl/spiece.model"))

    from video_styler_tpu.prompters.wan_prompter import WanPrompter
    fetched = {}
    p = WanPrompter()
    monkeypatch.setattr(p, "fetch_tokenizer",
                        lambda path: fetched.setdefault("path", path))
    monkeypatch.setattr(D, "download_tokenizer",
                        lambda *a, **k: str(tmp_path / "tok"))
    ck = tmp_path / "nothing" / "model.safetensors"
    assert p.fetch_tokenizer_near([str(ck)]) is True
    assert fetched["path"] == str(tmp_path / "tok")


def test_offline_gate(monkeypatch, tmp_path):
    monkeypatch.setenv("VIDEO_STYLER_OFFLINE", "1")
    with pytest.raises(RuntimeError, match="OFFLINE"):
        D.modelscope_transport("x/y", str(tmp_path), "*")


def test_retry_then_success(http_repo, monkeypatch):
    """Transient failures retry with backoff inside _http_get
    (image_generation.py:80-129 analog for downloads)."""
    import urllib.error
    import urllib.request
    attempts = {"n": 0}
    real_urlopen = urllib.request.urlopen

    def flaky(req, **kw):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise urllib.error.URLError("boom")
        return real_urlopen(req, **kw)

    monkeypatch.setattr(urllib.request, "urlopen", flaky)
    monkeypatch.setattr(D.time, "sleep", lambda s: None)
    got = D.modelscope_list_files("x/y")
    assert got and attempts["n"] == 2
