"""ModelConfig weight-source resolution (reference utils/__init__.py:158-218
API shape) and first-run tokenizer discovery."""
import os

import numpy as np
import pytest

from video_styler_tpu.utils.model_config import (
    ModelConfig, register_transport, _TRANSPORTS)


def test_local_path_passthrough(tmp_path):
    f = tmp_path / "model.safetensors"
    f.write_bytes(b"x")
    mc = ModelConfig(path=str(f))
    assert mc.paths() == [str(f)]
    mc2 = ModelConfig(path=[str(f), str(f)])
    assert len(mc2.paths()) == 2


def test_model_id_resolves_local_cache(tmp_path):
    root = tmp_path / "models"
    d = root / "Wan-AI" / "Wan2.1-VACE-14B"
    d.mkdir(parents=True)
    (d / "diffusion_pytorch_model-00001.safetensors").write_bytes(b"a")
    (d / "diffusion_pytorch_model-00002.safetensors").write_bytes(b"b")
    mc = ModelConfig(model_id="Wan-AI/Wan2.1-VACE-14B",
                     origin_file_pattern="diffusion_pytorch_model*.safetensors",
                     local_model_path=str(root))
    ps = mc.paths()
    assert len(ps) == 2 and ps[0].endswith("00001.safetensors")


def test_model_id_offline_raises(tmp_path):
    """The stock HTTP transports auto-register (utils/downloader.py), but the
    suite runs with VIDEO_STYLER_OFFLINE=1 — the fetch must refuse clearly."""
    mc = ModelConfig(model_id="nope/nope", origin_file_pattern="*.safetensors",
                     local_model_path=str(tmp_path))
    with pytest.raises(RuntimeError, match="OFFLINE"):
        mc.paths()


def test_model_id_missing_without_transport(tmp_path):
    mc = ModelConfig(model_id="nope/nope", origin_file_pattern="*.safetensors",
                     local_model_path=str(tmp_path),
                     download_resource="SomeUnknownMirror")
    with pytest.raises(RuntimeError, match="no transport is registered"):
        mc.paths()


def test_no_source_raises():
    with pytest.raises(ValueError, match="No valid model files"):
        ModelConfig().paths()


def test_registered_transport_called(tmp_path):
    calls = []

    def fake_dl(model_id, local_dir, allow):
        calls.append((model_id, allow))
        os.makedirs(local_dir, exist_ok=True)
        with open(os.path.join(local_dir, "w.safetensors"), "wb") as f:
            f.write(b"w")

    register_transport("FakeScope", fake_dl)
    try:
        mc = ModelConfig(model_id="org/model", origin_file_pattern="*.safetensors",
                         download_resource="FakeScope",
                         local_model_path=str(tmp_path))
        ps = mc.paths()
        assert calls == [("org/model", "*.safetensors")]
        assert ps[0].endswith("w.safetensors")
        # second call resolves from the local cache, no re-download
        mc2 = ModelConfig(model_id="org/model", origin_file_pattern="*.safetensors",
                          download_resource="FakeScope",
                          local_model_path=str(tmp_path))
        mc2.paths()
        assert len(calls) == 1
    finally:
        _TRANSPORTS.pop("FakeScope", None)


def test_tokenizer_discovery_near_checkpoints(tmp_path):
    """fetch_tokenizer_near finds sidecar tokenizer dirs next to weights."""
    from video_styler_tpu.prompters.wan_prompter import WanPrompter
    ckpt_dir = tmp_path / "Wan2.1-VACE-14B"
    tok_dir = tmp_path / "google" / "umt5-xxl"
    ckpt_dir.mkdir(); tok_dir.mkdir(parents=True)
    ckpt = ckpt_dir / "model.safetensors"
    ckpt.write_bytes(b"x")
    # an intentionally-broken tokenizer asset: discovery should FIND the dir
    # but keep searching / return False when loading fails
    (tok_dir / "tokenizer_config.json").write_text("{not json")
    p = WanPrompter()
    assert p.fetch_tokenizer_near([str(ckpt)]) is False
    assert p.tokenizer is None
