"""TileWorker, prompt refiners, quality metrics, processors chain."""
import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.ops.tiler import TileWorker
from video_styler_tpu.prompters.prompt_extend import (
    TemplatePromptExpander, PromptRefinerChain,
)
from video_styler_tpu.extensions.image_quality_metric import (
    AestheticPredictor, CLIPScore, get_metric,
)
from video_styler_tpu.processors import SequencialProcessor


def test_tileworker_identity_blend():
    """Tiled identity fn must reproduce the input exactly (blend weights
    normalize)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    out = TileWorker().tiled_forward(lambda t: t, x, tile_size=16,
                                     tile_stride=8)
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5, atol=1e-5)


def test_tileworker_scaling_fn():
    """forward_fn that 2x-upscales: output is (B, C, 2H, 2W)."""
    x = np.ones((1, 2, 16, 16), np.float32)
    out = TileWorker().tiled_forward(
        lambda t: jnp.repeat(jnp.repeat(t, 2, 2), 2, 3), x,
        tile_size=8, tile_stride=4)
    assert out.shape == (1, 2, 32, 32)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_prompt_refiner_chain():
    chain = PromptRefinerChain([TemplatePromptExpander()])
    out = chain("a cat", positive=True)
    assert out.startswith("a cat") and "quality" in out
    assert chain("a cat", positive=False) == "a cat"
    # idempotent-ish: no double suffix
    assert chain(out, positive=True) == out


def test_wan_prompter_applies_refiners():
    from video_styler_tpu.prompters.wan_prompter import WanPrompter
    p = WanPrompter.__new__(WanPrompter)
    from video_styler_tpu.prompters.prompt_extend import PromptRefinerChain
    p.refiners = PromptRefinerChain([TemplatePromptExpander()])
    assert "quality" in p.process_prompt("a dog")


def test_aesthetic_predictor_from_state_dict():
    rng = np.random.default_rng(0)
    sd = {}
    dims = [(768, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    for i, (a, b) in zip(("0", "2", "4", "6", "7"), dims):
        sd[f"layers.{i}.weight"] = rng.standard_normal((b, a)).astype(np.float32) * 0.01
        sd[f"layers.{i}.bias"] = np.zeros(b, np.float32)
    pred = AestheticPredictor.from_state_dict(sd)
    emb = rng.standard_normal((3, 768)).astype(np.float32)
    scores = pred.score_embeddings(emb)
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()


def test_clip_score_cosine():
    ie = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    te = np.asarray([[1.0, 0.0]], np.float32)
    cs = CLIPScore(lambda imgs: ie, lambda txts: te)
    scores = cs.score(["a", "b"], "prompt")
    assert abs(scores[0] - 100.0) < 1e-4 and abs(scores[1]) < 1e-4


def test_metric_registry():
    # all six metrics are registered now (pickscore needs params)
    with pytest.raises(TypeError):
        get_metric("pickscore")   # requires params arg
    with pytest.raises(ValueError):
        get_metric("nope")


def test_processors_chain():
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8))
              for _ in range(2)]
    chain = SequencialProcessor.from_config([
        {"processor_type": "contrast", "rate": 1.2},
        {"processor_type": "sharpness", "rate": 1.1},
    ])
    out = chain(frames)
    assert len(out) == 2 and out[0].size == (16, 16)
