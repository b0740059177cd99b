"""ComfyUI workflow runner: parse the reference's shipped Ditto workflow
(ditto_comfyui_workflow.json — the graph behind the 240 s baseline figure)
and run the extracted recipe through the pipeline with the UniPC sampler."""
import json
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "inference"))

from run_comfyui_workflow import parse_workflow, REFERENCE_WORKFLOW  # noqa: E402


def _workflow_path(tmp_path):
    if os.path.exists(REFERENCE_WORKFLOW):
        return REFERENCE_WORKFLOW
    # minimal same-shape graph for environments without the reference mount
    graph = {"nodes": [
        {"type": "WanVideoSampler",
         "widgets_values": [4, 1.2, 2.0, 7, "randomize", True, "unipc"]},
        {"type": "WanVideoTextEncode",
         "widgets_values": ["Make it a Pixel Art video.", "bad"]},
        {"type": "WanVideoVACEEncode",
         "widgets_values": [832, 480, 33, 0.975, 0, 1, False]},
        {"type": "WanVideoModelLoader",
         "widgets_values": ["Wan2_1-T2V-14B_fp8_e4m3fn.safetensors",
                            "fp16", "disabled", "offload_device", "sdpa"]},
        {"type": "WanVideoDecode",
         "widgets_values": [False, 272, 272, 144, 128, "default"]},
        {"type": "WanVideoSLG", "widgets_values": ["2", 0.2, 0.7]},
    ]}
    p = tmp_path / "wf.json"
    p.write_text(json.dumps(graph))
    return str(p)


def test_parse_reference_workflow(tmp_path):
    r = parse_workflow(_workflow_path(tmp_path))
    # the published baseline recipe (README.md:78 + the workflow file)
    assert r["steps"] == 4
    assert abs(r["cfg_scale"] - 1.2) < 1e-6
    assert abs(r["shift"] - 2.0) < 1e-6
    assert r["scheduler"] == "unipc"
    assert (r["width"], r["height"], r["num_frames"]) == (832, 480, 33)
    assert abs(r["vace_scale"] - 0.975) < 1e-6
    assert r["quantized"] is True
    assert r["tile_size"] == (34, 34)
    # WanVideoSLG executes natively now: blocks "2", window [0.2, 0.7)
    assert r["unsupported"] == []
    assert r["slg_blocks"] == (2,)
    assert abs(r["slg_start"] - 0.2) < 1e-6
    assert abs(r["slg_end"] - 0.7) < 1e-6


def test_workflow_recipe_runs_with_unipc(tmp_path):
    """The extracted recipe executes end-to-end on the tiny pipeline with
    the UniPC sampler swapped in (multistep host-step path)."""
    from test_pipeline import _tiny_pipe
    from video_styler_tpu.schedulers.flow_unipc import \
        FlowUniPCMultistepScheduler
    try:
        pipe = _tiny_pipe(with_vace=True)
    except Exception:
        pytest.skip("tiny pipe needs reference VAE")
    r = parse_workflow(_workflow_path(tmp_path))
    pipe.scheduler = FlowUniPCMultistepScheduler(shift=r["shift"])
    from PIL import Image
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8))
              for _ in range(5)]
    lat = pipe(r["prompt"], negative_prompt=r["negative_prompt"],
               vace_video=frames, vace_scale=r["vace_scale"],
               num_frames=5, height=32, width=32, seed=7,
               num_inference_steps=r["steps"], cfg_scale=r["cfg_scale"],
               sigma_shift=r["shift"], tiled=False, return_latents=True)
    assert lat.shape == (1, 4, 2, 4, 4)
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())


def test_slg_branch_difference():
    """Skip-layer guidance engages exactly inside its window: outputs with
    slg_blocks differ from the plain run, an out-of-window SLG config is a
    no-op, and the merged-CFG batch applies the gate to the nega rows only
    (split and merged modes agree)."""
    from test_pipeline import _tiny_pipe
    try:
        pipe = _tiny_pipe(with_vace=False)
    except Exception:
        pytest.skip("tiny pipe needs reference VAE")
    common = dict(num_frames=5, height=32, width=32, seed=3,
                  num_inference_steps=4, cfg_scale=4.0, tiled=False,
                  return_latents=True)
    lat_plain = pipe("a cat", **common)
    # window [1.0, 1.0) never matches any step -> exact no-op
    lat_noop = pipe("a cat", slg_blocks=(1,), slg_start=1.0, slg_end=1.0,
                    **common)
    assert float(jnp.abs(lat_plain - lat_noop).max()) == 0.0
    lat_slg = pipe("a cat", slg_blocks=(1,), slg_start=0.0, slg_end=1.0,
                   **common)
    assert bool(jnp.isfinite(lat_slg.astype(jnp.float32)).all())
    assert float(jnp.abs(lat_plain - lat_slg).mean()) > 1e-6
    lat_slg_merged = pipe("a cat", slg_blocks=(1,), slg_start=0.0,
                          slg_end=1.0, cfg_merge=True, **common)
    assert float(jnp.abs(lat_slg - lat_slg_merged).max()) < 2e-2, \
        "merged-CFG SLG gate must hit only the nega rows"


def test_unipc_swap_differs_from_euler():
    """The host-step multistep branch actually engages (outputs differ from
    the in-graph Euler path at the same settings)."""
    from test_pipeline import _tiny_pipe
    from video_styler_tpu.schedulers.flow_unipc import \
        FlowUniPCMultistepScheduler
    try:
        pipe = _tiny_pipe(with_vace=False)
    except Exception:
        pytest.skip("tiny pipe needs reference VAE")
    common = dict(num_frames=5, height=32, width=32, seed=3,
                  num_inference_steps=4, cfg_scale=1.0, tiled=False,
                  return_latents=True)
    lat_euler = pipe("a cat", **common)
    pipe.scheduler = FlowUniPCMultistepScheduler(shift=5.0)
    lat_unipc = pipe("a cat", **common)
    assert lat_euler.shape == lat_unipc.shape
    assert bool(jnp.isfinite(lat_unipc.astype(jnp.float32)).all())
    assert float(jnp.abs(lat_euler - lat_unipc).mean()) > 1e-5
