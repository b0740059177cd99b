"""QwenVL multimodal embedder + Qwen-Image-Edit prompt path.

Golden parity of the glue (template -> pad expansion -> vision scatter ->
mRoPE decoder -> drop_idx slice) against transformers Qwen2_5_VLModel on a
tiny config, plus the Step1x embedder surface (reference qwenvl.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.qwen_vl_embedder import (
    QwenVL, QwenVLStep1xEmbedder, _split_string)
from video_styler_tpu.models.qwen_vl_vision import (
    QwenVLVisionConfig, QWEN_VL_VISION_TINY, preprocess_image)
from video_styler_tpu.models.llm_decoder import DecoderLMConfig

from test_qwen_vl_vision import _tiny_vl_config, _rand_weights

SPECIALS = {"<|vision_start|>": 96, "<|image_pad|>": 98,
            "<|vision_end|>": 95, "<|im_start|>": 94, "<|im_end|>": 93}


class StubTokenizer:
    """Char-level tokenizer with the VL special tokens (test-only)."""

    def __call__(self, text, return_tensors="np", **kw):
        if isinstance(text, list):
            text = text[0]
        ids, i = [], 0
        while i < len(text):
            for s, tid in SPECIALS.items():
                if text.startswith(s, i):
                    ids.append(tid)
                    i += len(s)
                    break
            else:
                ids.append(1 + (ord(text[i]) % 88))
                i += 1
        return {"input_ids": np.asarray([ids], np.int64)}


TEXT_TINY = DecoderLMConfig(vocab_size=128, hidden=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, ffn=96,
                            rope_theta=1000000.0, eps=1e-6, qkv_bias=True)
VISION_TINY = QwenVLVisionConfig(
    depth=QWEN_VL_VISION_TINY.depth, hidden=QWEN_VL_VISION_TINY.hidden,
    num_heads=QWEN_VL_VISION_TINY.num_heads,
    intermediate=QWEN_VL_VISION_TINY.intermediate, out_hidden=64,
    patch=QWEN_VL_VISION_TINY.patch,
    temporal_patch=QWEN_VL_VISION_TINY.temporal_patch,
    merge=QWEN_VL_VISION_TINY.merge, window=QWEN_VL_VISION_TINY.window,
    fullatt=QWEN_VL_VISION_TINY.fullatt)


def _tiny_vl(seed=0):
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLModel)
    cfg = _tiny_vl_config()
    model = _rand_weights(Qwen2_5_VLModel(cfg).eval(), seed=seed)
    vl = QwenVL(model.state_dict(), StubTokenizer(), dtype=jnp.float32,
                text_cfg=TEXT_TINY, vision_cfg=VISION_TINY,
                mrope_section=(2, 3, 3), image_token_id=98,
                video_token_id=97, vision_end_token_id=95,
                min_pixels=16, max_pixels=64 * 64)
    return model, vl


def _rand_image(seed=0, size=(64, 48)):
    from PIL import Image
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (size[1], size[0], 3),
                                       np.uint8))


def test_encode_matches_transformers():
    import torch
    model, vl = _tiny_vl()
    img = _rand_image(1)
    text = "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>red"
    hidden, ids = vl.encode(text, [img])
    patches, grid = preprocess_image(img, VISION_TINY, 16, 64 * 64)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(np.asarray(ids, np.int64))[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([grid]),
            output_hidden_states=True).hidden_states[-1].numpy()
    np.testing.assert_allclose(hidden, want, rtol=3e-4, atol=5e-5)


def test_qwen_image_edit_prompt_path():
    """Pipeline encode_prompt_edit == transformers on the same template
    (single image, drop_idx 64; multi image picture blocks)."""
    import torch
    from video_styler_tpu.pipelines.qwen_image import (
        QwenImagePipeline, EDIT_TEMPLATE, EDIT_DROP_IDX)
    model, vl = _tiny_vl(seed=2)
    pipe = QwenImagePipeline(dtype=jnp.float32)
    pipe._vl = vl
    img = _rand_image(3)
    emb, mask, cache = pipe.encode_prompt_edit("add a hat", [img])

    txt = EDIT_TEMPLATE.format("add a hat")
    patches, grid = preprocess_image(img, VISION_TINY, 16, 64 * 64)
    ids = StubTokenizer()(vl._expand_image_pads(txt, [grid]))["input_ids"]
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([grid]),
            output_hidden_states=True).hidden_states[-1].numpy()
    np.testing.assert_allclose(np.asarray(emb), want[:, EDIT_DROP_IDX:],
                               rtol=3e-4, atol=5e-5)
    assert mask.shape == (1, emb.shape[1])
    # negative branch reuses the vision cache
    emb2, _, _ = pipe.encode_prompt_edit("", [img], _cache=cache)
    assert emb2.shape[-1] == emb.shape[-1]


def test_edit_multi_image():
    from video_styler_tpu.pipelines.qwen_image import QwenImagePipeline
    _, vl = _tiny_vl(seed=4)
    pipe = QwenImagePipeline(dtype=jnp.float32)
    pipe._vl = vl
    imgs = [_rand_image(5, (64, 48)), _rand_image(6, (48, 64))]
    emb, mask, _ = pipe.encode_prompt_edit("merge them", imgs)
    assert emb.ndim == 3 and emb.shape[0] == 1
    assert bool(jnp.isfinite(emb).all())


def test_split_string_quote_explosion():
    """qwenvl.py:64-90 semantics: quoted spans after char 155 explode into
    per-char quoted pieces."""
    s = "x" * 156 + 'say "hi"!'
    parts = _split_string(s)
    assert parts == ["x" * 156 + 'say "', "“h”", "“i”", '"!']


def test_step1x_embedder_surface():
    """(captions, ref_images) -> (embs (B, 640, H), masks); emb rows start
    at token 217 (qwenvl.py:156-166)."""
    _, vl = _tiny_vl(seed=7)
    emb_fn = QwenVLStep1xEmbedder(vl, max_length=640)
    embs, masks = emb_fn(["a red 'car'"], [_rand_image(8)])
    assert embs.shape == (1, 640, 64) and masks.shape == (1, 640)
    n = int(masks.sum())
    assert n > 0
    assert np.abs(embs[0, :n]).sum() > 0
    assert np.abs(embs[0, n:]).sum() == 0
