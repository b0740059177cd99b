"""Agent workflow: end-to-end offline run, checkpoint/resume, config."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from video_styler_tpu.agent import build_video_styling_app
from video_styler_tpu.agent.config import ConfigManager, expand_env
from video_styler_tpu.agent.image_generation import (
    image_generation_tool, retry_with_backoff, pil_to_data_url, data_url_to_pil,
)


def _make_video(path, n_frames=30, fps=10):
    import cv2
    rng = np.random.default_rng(0)
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (64, 48))
    for i in range(n_frames):
        frame = np.full((48, 64, 3), (i * 8) % 255, np.uint8)
        frame[10:20, 10:30] = rng.integers(0, 255, 3, np.uint8)
        vw.write(frame)
    vw.release()


def test_agent_end_to_end(tmp_path):
    video = tmp_path / "in.mp4"
    _make_video(video)
    app = build_video_styling_app(image_provider="mock")
    state = app.invoke({
        "video_url": str(video),
        "output_dir": str(tmp_path / "out"),
        "style_instruction": "van gogh style",
        "max_frames": 3,
    })
    assert state["current_node"] == "end"
    assert len(state["frames"]) == 3
    assert all(f["stylized_image_path"] for f in state["frames"])
    assert os.path.exists(state["output_video_path"])
    # checkpoint written by router
    assert (tmp_path / "out" / "state_last.json").exists()


def test_agent_resume_from_checkpoint(tmp_path):
    video = tmp_path / "in.mp4"
    _make_video(video)
    out = tmp_path / "out"
    app = build_video_styling_app(image_provider="mock")
    # run once fully, then corrupt current state and re-invoke: init_context
    # must resume from state_last.json, not redo work
    state = app.invoke({"video_url": str(video), "output_dir": str(out),
                        "style_instruction": "sketch", "max_frames": 2})
    with open(out / "state_last.json") as f:
        saved = json.load(f)
    assert saved["current_node"] == "end"
    state2 = app.invoke({"video_url": "/nonexistent.mp4",
                         "output_dir": str(out)})
    assert state2["current_node"] == "end"  # resumed, never touched the video


def test_retry_with_backoff_raises_after_retries():
    calls = []

    def boom():
        calls.append(1)
        raise RuntimeError("HTTP 503 service unavailable")  # retryable class

    with pytest.raises(RuntimeError):
        retry_with_backoff(boom, max_retries=2, base_delay=0.01)
    assert len(calls) == 2


def test_retry_with_backoff_no_retry_on_validation():
    """ValueError-class errors are non-retryable (reference
    _is_retryable_error keywords, image_generation.py:53-58)."""
    calls = []

    def boom():
        calls.append(1)
        raise ValueError("nope")

    with pytest.raises(ValueError):
        retry_with_backoff(boom, max_retries=3, base_delay=0.01)
    assert len(calls) == 1


def test_data_url_roundtrip():
    img = Image.fromarray(np.random.default_rng(0)
                          .integers(0, 255, (8, 8, 3), np.uint8))
    url = pil_to_data_url(img)
    back = data_url_to_pil(url)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_mock_provider_deterministic():
    img = Image.fromarray(np.random.default_rng(0)
                          .integers(0, 255, (16, 16, 3), np.uint8))
    a = image_generation_tool(img, "style A")
    b = image_generation_tool(img, "style A")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_env_expansion(monkeypatch):
    monkeypatch.setenv("MY_KEY", "secret123")
    cfg = ConfigManager(data={
        "agents": {"styler": {"model": {"model": "gemini-2.5-flash",
                                        "api_key": "${MY_KEY}"},
                              "prompt": "be stylish"}}})
    agent = cfg.get_agent_config("styler")
    assert agent.model.api_key == "secret123"
    assert agent.prompt == "be stylish"
    assert expand_env("${MISSING}") == ""
