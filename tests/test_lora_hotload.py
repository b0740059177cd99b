"""LoRA hotload: scale adjustment / unload without checkpoint IO, plus the
extended structural model-kind detection."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _tiny_pipe_and_lora():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "inference"))
    from infer_ditto import build_smoke_pipeline
    pipe = build_smoke_pipeline()
    d = pipe.dit_cfg.dim
    rng = np.random.default_rng(0)
    lora_sd = {
        "blocks.0.self_attn.q.lora_A.weight": rng.standard_normal(
            (4, d)).astype(np.float32) * 0.1,
        "blocks.0.self_attn.q.lora_B.weight": rng.standard_normal(
            (d, 4)).astype(np.float32) * 0.1,
    }
    return pipe, lora_sd


def test_hotload_scale_and_unload():
    pipe, lora_sd = _tiny_pipe_and_lora()
    base_w = np.asarray(pipe.dit_params["blocks"]["self_attn"]["q"]["w"][0],
                        np.float32)

    pipe.load_lora(target="dit", state_dict=lora_sd, alpha=1.0, hotload=True)
    w1 = np.asarray(pipe.dit_params["blocks"]["self_attn"]["q"]["w"][0],
                    np.float32)
    assert np.abs(w1 - base_w).max() > 1e-6

    pipe.set_lora_scale("dit", alpha=2.0)
    w2 = np.asarray(pipe.dit_params["blocks"]["self_attn"]["q"]["w"][0],
                    np.float32)
    # bf16 params: the delta survives only to bf16 resolution
    np.testing.assert_allclose(w2 - base_w, 2 * (w1 - base_w), rtol=0.2,
                               atol=2e-3)

    pipe.set_lora_scale("dit", alpha=0.0)
    w0 = np.asarray(pipe.dit_params["blocks"]["self_attn"]["q"]["w"][0],
                    np.float32)
    np.testing.assert_allclose(w0, base_w, rtol=1e-6)

    pipe.set_lora_scale("dit", alpha=1.0)
    pipe.unload_loras("dit")
    wu = np.asarray(pipe.dit_params["blocks"]["self_attn"]["q"]["w"][0],
                    np.float32)
    np.testing.assert_allclose(wu, base_w, rtol=1e-6)


def test_detect_model_kind_extended():
    from video_styler_tpu.utils.ckpt import detect_model_kind
    z = np.zeros((4, 4), np.float32)
    cases = [
        ({"double_blocks.0.img_attn.qkv.weight": z}, "flux_dit"),
        ({"img_in.weight": z}, "flux_dit"),
        ({"controlnet_x_embedder.weight": z}, "flux_controlnet"),
        ({"joint_blocks.0.x_block.attn.qkv.weight": z}, "sd3_dit"),
        ({"single_blocks.0.linear1.weight": z}, "hunyuan_video_dit"),
        ({"blocks.0.rota1.q_norm.weight": z}, "hunyuan_dit"),
        ({"llm.layers.0.self_attn.qkv_proj.weight": z}, "omnigen"),
        ({"encoder.layers.0.self_attention.query_key_value.weight": z},
         "kolors_text_encoder"),
        ({"transformer_blocks.0.attn1.norm_q.weight": z}, "qwen_image_dit"),
        ({"input_blocks.0.0.weight": z}, "sd_unet"),
        ({"wav2vec2.feature_extractor.conv_layers.0.conv.weight": z},
         "wav2vec"),
        ({"blocks.0.self_attn.q.weight": z}, "dit"),
        ({"token_embedding.weight": z}, "t5"),
        ({"controlnet_blocks.0.x_rms.weight": z, "img_in.weight": z},
         "qwen_image_blockwise_controlnet"),
        ({"embedder.model_dict.blocks___0___ff_a___0.x": z},
         "flux_lora_encoder"),
        ({"prefer_value_embedder.0.weight": z, "positional_embedding": z},
         "flux_value_encoder"),
        ({"layers.0.0.to_kv.weight": z, "latents": z},
         "flux_infiniteyou_projector"),
        ({"tok_embeddings.word_embeddings.weight": z,
          "transformer.layers.0.attention.wqkv.weight": z},
         "stepvideo_text_encoder"),
        ({"motion_modules.0.transformer_blocks.0.attention_blocks.0.to_q.weight": z},
         "motion_modules"),
    ]
    for sd, want in cases:
        assert detect_model_kind(sd) == want, (sd.keys(), want)


def test_load_model_dispatch(tmp_path):
    """load_model: point at a checkpoint file -> (kind, converted params)
    (ModelManager.load_model analog, model_manager.py:395-467)."""
    import torch
    from safetensors.torch import save_file
    from video_styler_tpu.utils.ckpt import load_model
    from ref_loader import ref_available, load_ref
    if not ref_available():
        import pytest
        pytest.skip("reference not mounted")

    torch.manual_seed(0)
    cn = load_ref("models.qwen_image_controlnet").QwenImageBlockWiseControlNet(
        num_layers=2, in_dim=64, dim=32).eval()
    p = tmp_path / "cn.safetensors"
    save_file({k: v.contiguous() for k, v in cn.state_dict().items()}, str(p))
    kind, params = load_model(str(p))
    assert kind == "qwen_image_blockwise_controlnet"
    assert params["blocks"]["x_rms"]["scale"].shape == (2, 32)

    enc = load_ref("models.flux_value_control").SingleValueEncoder(
        dim_in=16, dim_out=32, prefer_len=4).eval()
    p2 = tmp_path / "val.safetensors"
    save_file({k: v.contiguous() for k, v in enc.state_dict().items()},
              str(p2))
    kind2, params2 = load_model(str(p2))
    assert kind2 == "flux_value_encoder"
    assert params2["pos"].shape == (4, 32)


def test_xlm_roberta_parity():
    """XLM-R text tower vs the reference XLMRoberta definitions
    (wan_video_image_encoder.py:14-141,617-640).

    The reference file clobbers SelfAttention/AttentionBlock with later
    CLIP-flavored classes of the same name, so the module-level XLMRoberta
    is broken (its blocks take no mask); the oracle here execs the ORIGINAL
    class definitions (lines 14-141) and composes the WithHead pooling by
    hand."""
    from ref_loader import ref_available, REF_ROOT
    if not ref_available():
        pytest.skip("reference not mounted")
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    src = open(f"{REF_ROOT}/diffsynth/models/"
               "wan_video_image_encoder.py").read()
    start = src.index("class SelfAttention")
    end = src.index("def xlm_roberta_large")
    ns = {"torch": torch, "nn": nn, "F": F}
    exec(src[start:end], ns)
    torch.manual_seed(0)
    model = ns["XLMRoberta"](vocab_size=64, max_seq_len=32, type_size=1,
                             pad_id=1, dim=32, num_heads=4, num_layers=2,
                             post_norm=True, dropout=0.0).eval()
    head = torch.nn.Sequential(torch.nn.Linear(32, 28, bias=False),
                               torch.nn.GELU(),
                               torch.nn.Linear(28, 24, bias=False)).eval()
    torch.manual_seed(1)
    for p in head.parameters():
        torch.nn.init.normal_(p, std=0.1)

    from video_styler_tpu.models.clip_vit import (convert_xlm_roberta,
                                                  xlm_roberta_forward)
    sd = {f"textual.{k}": v for k, v in model.state_dict().items()}
    sd["textual.head.0.weight"] = head[0].weight
    sd["textual.head.2.weight"] = head[2].weight
    params = convert_xlm_roberta(sd, num_layers=2, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 64, (2, 10)).astype(np.int64)
    ids[1, 6:] = 1      # pad
    with torch.no_grad():
        x = model(torch.from_numpy(ids))
        mask = torch.from_numpy(ids).ne(1).unsqueeze(-1).to(x)
        pooled = (x * mask).sum(dim=1) / mask.sum(dim=1)
        want = head(pooled).numpy()
    got = np.asarray(xlm_roberta_forward(params, jnp.asarray(ids),
                                         num_heads=4), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
