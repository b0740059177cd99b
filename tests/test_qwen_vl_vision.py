"""Golden parity: Qwen2.5-VL vision tower + mRoPE vs transformers.

Validates the native replacement for the vision side of the reference's
Qwen-Image-Edit prompt encoder (qwen_image.py:552-575 drives pixel_values +
image_grid_thw through transformers Qwen2_5_VLModel) and the Step1x VL
embedder (qwenvl.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.qwen_vl_vision import (
    QwenVLVisionConfig, QWEN_VL_VISION_TINY, preprocess_image, vision_plan,
    vision_forward, convert_qwen_vl_vision, detect_vision_config,
    get_rope_index, init_qwen_vl_vision)
from video_styler_tpu.models.llm_decoder import (
    DecoderLMConfig, decoder_lm_forward, convert_decoder_lm, mrope_tables)


def _rand_weights(model, seed=0):
    import torch
    torch.manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name or name.endswith("ln_q.weight"):
                p.data = 1.0 + 0.1 * torch.randn_like(p.data)
            else:
                p.data = torch.randn_like(p.data) * 0.05
    return model


def _torch_vision(cfg: QwenVLVisionConfig, seed=0):
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel)
    tc = Qwen2_5_VLVisionConfig(
        depth=cfg.depth, hidden_size=cfg.hidden, num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate, out_hidden_size=cfg.out_hidden,
        in_channels=cfg.in_channels, patch_size=cfg.patch,
        temporal_patch_size=cfg.temporal_patch,
        spatial_merge_size=cfg.merge, window_size=cfg.window,
        fullatt_block_indexes=list(cfg.fullatt), hidden_act="silu")
    tc._attn_implementation = "eager"
    return _rand_weights(
        Qwen2_5_VisionTransformerPretrainedModel(tc).eval(), seed)


def _convert(model, cfg):
    sd = {("visual." + k): v for k, v in model.state_dict().items()}
    assert detect_vision_config(sd).depth == cfg.depth
    return convert_qwen_vl_vision(sd, cfg, dtype=jnp.float32)


@pytest.mark.parametrize("grid", [(1, 6, 10), (1, 8, 8)])
def test_vision_tower_parity(grid):
    """Nondivisible (6x10 -> llm 3x5, merger window 2) exercises the window
    padding path; divisible 8x8 the clean path."""
    import torch
    cfg = QWEN_VL_VISION_TINY
    model = _torch_vision(cfg)
    params = _convert(model, cfg)
    n = grid[0] * grid[1] * grid[2]
    torch.manual_seed(1)
    patches = torch.randn(n, cfg.patch_dim)
    with torch.no_grad():
        want = model(patches, grid_thw=torch.tensor([grid])).numpy()
    plan = vision_plan([grid], cfg)
    got = np.asarray(vision_forward(params, cfg,
                                    jnp.asarray(patches.numpy()), plan))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-5)


def test_vision_two_images():
    """Multi-image batch (Step1x/edit-multi path): full-attention blocks must
    not attend across images."""
    import torch
    cfg = QWEN_VL_VISION_TINY
    model = _torch_vision(cfg, seed=2)
    params = _convert(model, cfg)
    grids = [(1, 4, 6), (1, 2, 4)]
    n = sum(t * h * w for t, h, w in grids)
    torch.manual_seed(3)
    patches = torch.randn(n, cfg.patch_dim)
    with torch.no_grad():
        want = model(patches, grid_thw=torch.tensor(grids)).numpy()
    got = np.asarray(vision_forward(params, cfg, jnp.asarray(patches.numpy()),
                                    vision_plan(grids, cfg)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-5)


def test_processor_parity():
    """preprocess_image vs transformers Qwen2VLImageProcessor (bicubic
    smart-resize + CLIP normalize + merge-order patch flattening)."""
    from PIL import Image
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (123, 207, 3), np.uint8))
    proc = Qwen2VLImageProcessor(min_pixels=56 * 56, max_pixels=28 * 28 * 64)
    want = proc.preprocess(images=img, return_tensors="np")
    got, grid = preprocess_image(img, min_pixels=56 * 56,
                                 max_pixels=28 * 28 * 64)
    assert tuple(want["image_grid_thw"][0]) == grid
    np.testing.assert_allclose(got, want["pixel_values"], rtol=1e-5,
                               atol=1e-5)


def test_rope_index_parity():
    """get_rope_index vs Qwen2_5_VLModel for text+image sequences."""
    import torch
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLModel)
    cfg = _tiny_vl_config()
    model = Qwen2_5_VLModel(cfg)
    grid = (1, 6, 10)
    ids = _ids_with_image(cfg, grid, n_pre=5, n_post=7)
    want, _ = model.get_rope_index(
        input_ids=torch.tensor(ids)[None],
        image_grid_thw=torch.tensor([grid]),
        attention_mask=torch.ones(1, len(ids), dtype=torch.long))
    got = get_rope_index(np.asarray(ids), [grid], merge=2,
                         tokens_per_second=cfg.vision_config.tokens_per_second,
                         image_token_id=cfg.image_token_id,
                         video_token_id=cfg.video_token_id)
    np.testing.assert_array_equal(got, want[:, 0].numpy())


def _tiny_vl_config():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig)
    v = QWEN_VL_VISION_TINY
    cfg = Qwen2_5_VLConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-6, rope_theta=1000000.0,
        rope_scaling={"type": "default", "mrope_section": [2, 3, 3]},
        image_token_id=98, video_token_id=97, vision_start_token_id=96,
        vision_end_token_id=95,
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden, num_heads=v.num_heads,
            intermediate_size=v.intermediate, out_hidden_size=64,
            in_channels=3, patch_size=v.patch,
            temporal_patch_size=v.temporal_patch, spatial_merge_size=v.merge,
            window_size=v.window, fullatt_block_indexes=list(v.fullatt),
            hidden_act="silu"),
        attn_implementation="eager")
    cfg.text_config._attn_implementation = "eager"
    cfg.vision_config._attn_implementation = "eager"
    return cfg


def _ids_with_image(cfg, grid, n_pre=4, n_post=6, seed=0):
    rng = np.random.RandomState(seed)
    n_img = grid[0] * grid[1] * grid[2] // 4
    return (list(rng.randint(1, 90, n_pre))
            + [cfg.vision_start_token_id] + [cfg.image_token_id] * n_img
            + [cfg.vision_end_token_id] + list(rng.randint(1, 90, n_post)))


def test_full_vl_model_parity():
    """End-to-end text+image: vision embeds scattered at image-pad positions,
    decoder under multimodal RoPE, final norm — vs Qwen2_5_VLModel
    hidden_states[-1] (the reference's exact output,
    qwen_image_text_encoder.py:217-235)."""
    import torch
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLModel)
    cfg = _tiny_vl_config()
    model = _rand_weights(Qwen2_5_VLModel(cfg).eval(), seed=4)

    vcfg = QwenVLVisionConfig(
        depth=QWEN_VL_VISION_TINY.depth, hidden=QWEN_VL_VISION_TINY.hidden,
        num_heads=QWEN_VL_VISION_TINY.num_heads,
        intermediate=QWEN_VL_VISION_TINY.intermediate, out_hidden=64,
        patch=QWEN_VL_VISION_TINY.patch,
        temporal_patch=QWEN_VL_VISION_TINY.temporal_patch,
        merge=QWEN_VL_VISION_TINY.merge, window=QWEN_VL_VISION_TINY.window,
        fullatt=QWEN_VL_VISION_TINY.fullatt)
    tcfg = DecoderLMConfig(vocab_size=128, hidden=64, num_layers=2,
                           num_heads=4, num_kv_heads=2, ffn=96,
                           rope_theta=1000000.0, eps=1e-6, qkv_bias=True)

    sd = model.state_dict()
    vparams = convert_qwen_vl_vision(sd, vcfg, dtype=jnp.float32)
    tparams = convert_decoder_lm(
        {k: v for k, v in sd.items() if not k.startswith("visual.")},
        tcfg, dtype=jnp.float32)

    grid = (1, 6, 10)
    ids = _ids_with_image(cfg, grid, seed=5)
    torch.manual_seed(6)
    patches = torch.randn(grid[1] * grid[2], vcfg.patch_dim)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=patches, image_grid_thw=torch.tensor([grid]),
            output_hidden_states=True).hidden_states[-1].numpy()

    img_emb = vision_forward(vparams, vcfg, jnp.asarray(patches.numpy()),
                             vision_plan([grid], vcfg))
    ids_np = np.asarray(ids)
    embeds = jnp.take(tparams["embed"], jnp.asarray(ids_np)[None], axis=0)
    embeds = embeds.at[0, np.where(ids_np == cfg.image_token_id)[0]].set(
        img_emb)
    pos = get_rope_index(ids_np, [grid], merge=2,
                         tokens_per_second=vcfg.tokens_per_second,
                         image_token_id=cfg.image_token_id,
                         video_token_id=cfg.video_token_id)
    got = np.asarray(decoder_lm_forward(
        tparams, tcfg, jnp.asarray(ids_np)[None],
        jnp.ones((1, len(ids)), jnp.int32), inputs_embeds=embeds,
        position_ids=pos, mrope_section=(2, 3, 3)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=5e-5)


def test_mrope_text_only_degenerates():
    """All-equal position streams == standard RoPE tables."""
    from video_styler_tpu.models.llm_decoder import rope_tables
    cfg = DecoderLMConfig(vocab_size=32, hidden=64, num_layers=1,
                          num_heads=4, num_kv_heads=2, ffn=64,
                          rope_theta=1000000.0)
    L = 9
    pos = np.broadcast_to(np.arange(L), (3, L))
    c1, s1 = mrope_tables(cfg, pos, (2, 3, 3))
    c2, s2 = rope_tables(cfg, L)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_init_runs():
    cfg = QWEN_VL_VISION_TINY
    import jax
    params = init_qwen_vl_vision(jax.random.PRNGKey(0), cfg)
    grid = (1, 4, 4)
    patches = jnp.ones((16, cfg.patch_dim))
    out = vision_forward(params, cfg, patches, vision_plan([grid], cfg))
    assert out.shape == (4, cfg.out_hidden)
    assert bool(jnp.isfinite(out).all())
