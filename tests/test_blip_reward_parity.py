"""Golden parity: BLIP reward tower vs the reference med.py BERT and an
HF ViT twin (the reference BLIP/vit.py needs timm, absent here; HF ViTModel
is block-for-block the same pre-LN ViT, so its weights are remapped into the
BLIP checkpoint layout to exercise our converter + forward)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

import video_styler_tpu.models.blip_reward as B
from ref_loader import ref_available, load_ref

CFG = B.BLIP_REWARD_TINY


def _vit_state_dict_from_hf(model):
    """HF ViTModel weights -> BLIP visual_encoder naming."""
    hf = model.state_dict()
    sd = {
        "blip.visual_encoder.patch_embed.proj.weight":
            hf["embeddings.patch_embeddings.projection.weight"],
        "blip.visual_encoder.patch_embed.proj.bias":
            hf["embeddings.patch_embeddings.projection.bias"],
        "blip.visual_encoder.cls_token": hf["embeddings.cls_token"],
        "blip.visual_encoder.pos_embed": hf["embeddings.position_embeddings"],
        "blip.visual_encoder.norm.weight": hf["layernorm.weight"],
        "blip.visual_encoder.norm.bias": hf["layernorm.bias"],
    }
    for i in range(CFG.vit_layers):
        h = f"encoder.layer.{i}"
        b = f"blip.visual_encoder.blocks.{i}"
        sd[f"{b}.attn.qkv.weight"] = torch.cat(
            [hf[f"{h}.attention.attention.{x}.weight"]
             for x in ("query", "key", "value")])
        sd[f"{b}.attn.qkv.bias"] = torch.cat(
            [hf[f"{h}.attention.attention.{x}.bias"]
             for x in ("query", "key", "value")])
        sd[f"{b}.attn.proj.weight"] = hf[f"{h}.attention.output.dense.weight"]
        sd[f"{b}.attn.proj.bias"] = hf[f"{h}.attention.output.dense.bias"]
        sd[f"{b}.norm1.weight"] = hf[f"{h}.layernorm_before.weight"]
        sd[f"{b}.norm1.bias"] = hf[f"{h}.layernorm_before.bias"]
        sd[f"{b}.norm2.weight"] = hf[f"{h}.layernorm_after.weight"]
        sd[f"{b}.norm2.bias"] = hf[f"{h}.layernorm_after.bias"]
        sd[f"{b}.mlp.fc1.weight"] = hf[f"{h}.intermediate.dense.weight"]
        sd[f"{b}.mlp.fc1.bias"] = hf[f"{h}.intermediate.dense.bias"]
        sd[f"{b}.mlp.fc2.weight"] = hf[f"{h}.output.dense.weight"]
        sd[f"{b}.mlp.fc2.bias"] = hf[f"{h}.output.dense.bias"]
    return sd


def _tiny_hf_vit():
    from transformers import ViTModel, ViTConfig
    torch.manual_seed(0)
    return ViTModel(ViTConfig(
        hidden_size=CFG.vit_dim, num_hidden_layers=CFG.vit_layers,
        num_attention_heads=CFG.vit_heads, intermediate_size=CFG.vit_dim * 4,
        image_size=CFG.image_size, patch_size=CFG.patch_size,
        layer_norm_eps=CFG.vit_eps, hidden_act="gelu"),
        add_pooling_layer=False).eval()


def _bert_sd(model, extra):
    sd = dict(extra)
    for k, v in model.state_dict().items():
        sd[f"blip.text_encoder.{k}"] = v
    return sd


def _tiny_ref_bert():
    # med.py imports helpers from their pre-4.27 location
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for name in ("apply_chunking_to_forward", "prune_linear_layer",
                 "find_pruneable_heads_and_indices"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    med = load_ref("extensions.ImageQualityMetric.BLIP.med")
    from transformers.models.bert.configuration_bert import BertConfig
    cfg = BertConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.text_dim,
        num_hidden_layers=CFG.text_layers, num_attention_heads=CFG.text_heads,
        intermediate_size=CFG.text_ffn, max_position_embeddings=CFG.max_pos,
        add_cross_attention=True, is_decoder=False)
    cfg.encoder_width = CFG.vit_dim
    torch.manual_seed(1)
    return med.BertModel(config=cfg, add_pooling_layer=False).eval()


def test_blip_vit_parity():
    model = _tiny_hf_vit()
    params = B.convert_image_reward(
        _vit_state_dict_from_hf(model), CFG) if False else None
    # converter needs the BERT keys too; convert only the vit via full dict
    sd = _vit_state_dict_from_hf(model)
    # fabricate minimal bert/mlp entries so the full converter runs
    bert = _tiny_ref_bert()
    sd = {**sd, **_bert_sd(bert, {})}
    mlp_dims = [(CFG.text_dim, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    for i, (a, b) in zip(("0", "2", "4", "6", "7"), mlp_dims):
        sd[f"mlp.layers.{i}.weight"] = torch.zeros(b, a)
        sd[f"mlp.layers.{i}.bias"] = torch.zeros(b)
    params = B.convert_image_reward(sd, CFG)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, CFG.image_size, CFG.image_size)
                              ).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(pix)).last_hidden_state.numpy()
    got = np.asarray(B.blip_vit_forward(params, CFG, jnp.asarray(pix)),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_blip_bert_multimodal_parity():
    bert = _tiny_ref_bert()
    vit = _tiny_hf_vit()
    sd = {**_vit_state_dict_from_hf(vit), **_bert_sd(bert, {})}
    for i, (a, b) in zip(("0", "2", "4", "6", "7"),
                         [(CFG.text_dim, 8), (8, 8), (8, 8), (8, 4), (4, 1)]):
        sd[f"mlp.layers.{i}.weight"] = torch.zeros(b, a)
        sd[f"mlp.layers.{i}.bias"] = torch.zeros(b)
    params = B.convert_image_reward(sd, CFG)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, (2, 9)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 6:] = 0
    img = rng.standard_normal((2, 5, CFG.vit_dim)).astype(np.float32)
    with torch.no_grad():
        want = bert(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(img),
            encoder_attention_mask=torch.ones(2, 5, dtype=torch.long),
            return_dict=True).last_hidden_state.numpy()
    got = np.asarray(B.blip_bert_forward(params, CFG, jnp.asarray(ids),
                                         jnp.asarray(mask), jnp.asarray(img)),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_image_reward_forward_end_to_end():
    """Full score path vs composing the reference pieces by hand
    (imagereward.py:125-148)."""
    bert = _tiny_ref_bert()
    vit = _tiny_hf_vit()
    torch.manual_seed(2)
    mlp_layers = torch.nn.Sequential(
        torch.nn.Linear(CFG.text_dim, 1024), torch.nn.Dropout(0.2),
        torch.nn.Linear(1024, 128), torch.nn.Dropout(0.2),
        torch.nn.Linear(128, 64), torch.nn.Dropout(0.1),
        torch.nn.Linear(64, 16), torch.nn.Linear(16, 1)).eval()
    sd = {**_vit_state_dict_from_hf(vit), **_bert_sd(bert, {})}
    for k, v in mlp_layers.state_dict().items():
        sd[f"mlp.layers.{k}"] = v
    params = B.convert_image_reward(sd, CFG)

    rng = np.random.default_rng(3)
    pix = rng.standard_normal((1, 3, CFG.image_size, CFG.image_size)
                              ).astype(np.float32)
    ids = rng.integers(0, CFG.vocab_size, (1, 7)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        img_emb = vit(torch.from_numpy(pix)).last_hidden_state
        txt = bert(torch.from_numpy(ids),
                   attention_mask=torch.from_numpy(mask),
                   encoder_hidden_states=img_emb,
                   encoder_attention_mask=torch.ones(img_emb.shape[:2],
                                                     dtype=torch.long),
                   return_dict=True).last_hidden_state[:, 0, :]
        want = ((mlp_layers(txt) - CFG.mean) / CFG.std).numpy()[:, 0]
    got = np.asarray(B.image_reward_forward(params, CFG, jnp.asarray(pix),
                                            jnp.asarray(ids),
                                            jnp.asarray(mask)), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
