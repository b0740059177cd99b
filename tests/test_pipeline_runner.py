"""JSON-driven SDVideoPipelineRunner + smoother hooks (reference
pipelines/pipeline_runner.py:8-105, sd_video.py:249-267). Runs on stubbed
model functions — orchestration logic only (model math is covered by the
SD parity suites)."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

import video_styler_tpu.pipelines.sd_video as sdv
from video_styler_tpu.pipelines.pipeline_runner import SDVideoPipelineRunner
from video_styler_tpu.pipelines.sd_video import SDVideoPipeline


@pytest.fixture
def tiny_pipe(monkeypatch):
    monkeypatch.setattr(
        sdv.SD, "sd_unet_forward",
        lambda params, sample, t, ctx, controlnet_res_stack=None,
        ipadapter_kwargs_list=None, motion=None: sample * 0.1)
    monkeypatch.setattr(
        sdv.SD, "sd_vae_encoder_forward",
        lambda params, x: jnp.zeros((x.shape[0], 4, x.shape[2] // 8,
                                     x.shape[3] // 8), jnp.float32))
    monkeypatch.setattr(
        sdv.SD, "sd_vae_decoder_forward",
        lambda params, z: jnp.zeros((z.shape[0], 3, z.shape[2] * 8,
                                     z.shape[3] * 8), jnp.float32))
    pipe = SDVideoPipeline(dtype=jnp.float32)
    pipe.unet_params = pipe.vae_encoder_params = pipe.vae_decoder_params = {}
    pipe.encode_prompt = lambda p, clip_skip=1: jnp.zeros((1, 77, 768),
                                                          jnp.float32)
    return pipe


def test_runner_end_to_end(tmp_path, tiny_pipe):
    frames_dir = tmp_path / "in"
    os.makedirs(frames_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            frames_dir / f"{i:03d}.png")

    config = {
        "models": {"model_list": []},
        "data": {
            "input_frames": {"video_file": str(frames_dir), "height": 64,
                             "width": 64, "start_frame_id": 0,
                             "end_frame_id": 4},
            "controlnet_frames": [],
            "output_folder": str(tmp_path / "out"),
            "fps": 8,
        },
        "pipeline": {
            "seed": 0,
            "pipeline_inputs": {
                "prompt": "a cat",
                "cfg_scale": 1.0,
                "num_inference_steps": 2,
                "animatediff_batch_size": 4,
                "animatediff_stride": 2,
            },
        },
    }
    runner = SDVideoPipelineRunner()
    frames = runner.run(config, pipe=tiny_pipe)
    assert len(frames) == 4
    out = tmp_path / "out"
    assert (out / "video.mp4").exists()
    assert (out / "config.json").exists()
    assert len(os.listdir(out / "frames")) == 4
    saved = json.load(open(out / "config.json"))
    assert "input_frames" not in saved["pipeline"]["pipeline_inputs"]


def test_smoother_hooks(tiny_pipe):
    calls = []

    def smoother(frames, original_frames=None):
        calls.append(len(frames))
        return frames

    frames = tiny_pipe("a cat", num_frames=2, height=64, width=64,
                       num_inference_steps=2, cfg_scale=1.0, seed=0,
                       smoother=smoother, smoother_progress_ids=[0, -1],
                       animatediff_batch_size=2, animatediff_stride=2)
    assert len(frames) == 2
    assert calls == [2, 2]      # mid-loop render at step 0 + final
