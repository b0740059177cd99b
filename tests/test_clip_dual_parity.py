"""Golden parity: dual-tower CLIP + MPS cross model vs HF transformers and
the reference cross_modeling module
(/root/reference/diffsynth/extensions/ImageQualityMetric/)."""
import numpy as np
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.clip_dual as C
from ref_loader import ref_available, load_ref

CFG = C.CLIP_DUAL_TINY


def _tiny_hf_clip():
    import torch
    from transformers import CLIPModel, CLIPConfig, CLIPTextConfig, CLIPVisionConfig
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            hidden_size=CFG.text_dim, num_hidden_layers=CFG.text_layers,
            num_attention_heads=CFG.text_heads,
            intermediate_size=CFG.text_dim * 4, vocab_size=CFG.vocab_size,
            max_position_embeddings=CFG.max_len, hidden_act="gelu",
            eos_token_id=CFG.eos_token_id, bos_token_id=0,
            pad_token_id=1).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=CFG.vision_dim, num_hidden_layers=CFG.vision_layers,
            num_attention_heads=CFG.vision_heads,
            intermediate_size=CFG.vision_dim * 4, image_size=CFG.image_size,
            patch_size=CFG.patch_size, hidden_act="gelu").to_dict(),
        projection_dim=CFG.proj_dim)
    torch.manual_seed(0)
    return CLIPModel(cfg).eval()


def _ids():
    rng = np.random.default_rng(0)
    ids = rng.integers(2, CFG.vocab_size - 1, (2, CFG.max_len)).astype(np.int64)
    ids[0, 5] = CFG.eos_token_id
    ids[1, 3] = CFG.eos_token_id
    mask = np.ones_like(ids)
    mask[1, 6:] = 0
    return ids, mask


def test_clip_text_features_parity():
    import torch
    model = _tiny_hf_clip()
    params = C.convert_hf_clip(model.state_dict(), CFG)
    ids, mask = _ids()
    with torch.no_grad():
        want = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    got = np.asarray(C.clip_text_features(params, CFG, jnp.asarray(ids),
                                          jnp.asarray(mask)), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_image_features_parity():
    import torch
    model = _tiny_hf_clip()
    params = C.convert_hf_clip(model.state_dict(), CFG)
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((2, 3, CFG.image_size, CFG.image_size)
                              ).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(pix)).numpy()
    got = np.asarray(C.clip_image_features(params, CFG, jnp.asarray(pix)),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_token_level_projection_matches_xclip():
    """MPS projects the raw last_hidden_state (clip_model.py:49-89)."""
    import torch
    model = _tiny_hf_clip()
    params = C.convert_hf_clip(model.state_dict(), CFG)
    ids, mask = _ids()
    with torch.no_grad():
        out = model.text_model(input_ids=torch.from_numpy(ids),
                               attention_mask=torch.from_numpy(mask))
        want = model.text_projection(out[0]).numpy()
    tokens, _ = C.clip_text_forward(params, CFG, jnp.asarray(ids),
                                    jnp.asarray(mask))
    from video_styler_tpu.ops.basic import linear
    got = np.asarray(linear(params["text_projection"], tokens), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_open_clip_converter_agrees_with_hf():
    """Remap the HF weights into the open_clip layout; both converters must
    produce identical features."""
    import torch
    model = _tiny_hf_clip()
    hf = model.state_dict()
    oc = {
        "visual.conv1.weight": hf["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding": hf["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": hf["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": hf["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": hf["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": hf["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": hf["vision_model.post_layernorm.bias"],
        "visual.proj": hf["visual_projection.weight"].T,
        "token_embedding.weight": hf["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": hf["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": hf["text_model.final_layer_norm.weight"],
        "ln_final.bias": hf["text_model.final_layer_norm.bias"],
        "text_projection": hf["text_projection.weight"].T,
        "logit_scale": hf["logit_scale"],
    }
    for tower, oc_pre, n in ((f"vision_model", "visual.transformer",
                              CFG.vision_layers),
                             ("text_model", "transformer", CFG.text_layers)):
        for i in range(n):
            h = f"{tower}.encoder.layers.{i}"
            o = f"{oc_pre}.resblocks.{i}"
            oc[f"{o}.attn.in_proj_weight"] = torch.cat(
                [hf[f"{h}.self_attn.{x}_proj.weight"] for x in "qkv"])
            oc[f"{o}.attn.in_proj_bias"] = torch.cat(
                [hf[f"{h}.self_attn.{x}_proj.bias"] for x in "qkv"])
            for a, b in (("attn.out_proj", "self_attn.out_proj"),
                         ("ln_1", "layer_norm1"), ("ln_2", "layer_norm2"),
                         ("mlp.c_fc", "mlp.fc1"), ("mlp.c_proj", "mlp.fc2")):
                oc[f"{o}.{a}.weight"] = hf[f"{h}.{b}.weight"]
                oc[f"{o}.{a}.bias"] = hf[f"{h}.{b}.bias"]
    p_hf = C.convert_hf_clip(hf, CFG)
    p_oc = C.convert_open_clip(oc, CFG)
    ids, _ = _ids()
    a = np.asarray(C.clip_text_features(p_hf, CFG, jnp.asarray(ids)))
    b = np.asarray(C.clip_text_features(p_oc, CFG, jnp.asarray(ids)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    rng = np.random.default_rng(2)
    pix = rng.standard_normal((1, 3, CFG.image_size, CFG.image_size)
                              ).astype(np.float32)
    a = np.asarray(C.clip_image_features(p_hf, CFG, jnp.asarray(pix)))
    b = np.asarray(C.clip_image_features(p_oc, CFG, jnp.asarray(pix)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_cross_model_parity():
    import torch
    ref = load_ref("extensions.ImageQualityMetric.trainer.models.cross_modeling")
    torch.manual_seed(0)
    dim, heads = 48, 3
    model = ref.Cross_model(dim=dim, layer_num=2, dim_head=64,
                            heads=heads).eval()
    params = C.convert_cross_model(model.state_dict(), num_layers=2)

    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 5, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, dim)).astype(np.float32)
    mask = np.where(rng.random((2, 5, 7)) > 0.3, 0.0, -np.inf
                    ).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(q), torch.from_numpy(ctx),
                     torch.from_numpy(mask)).numpy()
    got = np.asarray(C.cross_model_forward(params, jnp.asarray(q),
                                           jnp.asarray(ctx),
                                           jnp.asarray(mask), heads=heads),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
