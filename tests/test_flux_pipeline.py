"""FluxImagePipeline end-to-end (tiny models, CPU) + FLUX LoRA converters."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.flux_dit import (
    FLUX_DIT_TINY, init_flux_dit, convert_flux_dit)
from video_styler_tpu.pipelines.flux_image import FluxImagePipeline
from video_styler_tpu.flux_lora import convert_flux_lora
from video_styler_tpu.lora import merge_lora

CFG = FLUX_DIT_TINY


def _tiny_pipe():
    pipe = FluxImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = CFG
    pipe.dit_params = init_flux_dit(jax.random.PRNGKey(0), CFG)
    # stub VAE (pipeline-path test; real VAE parity is covered in
    # test_sd3_flux_encoders.py)
    pipe.encode_image = lambda arr: jnp.asarray(
        np.repeat(arr[:, :1], 16, 1)[:, :, ::8, ::8], jnp.float32)
    pipe.decode_image = lambda z: jnp.zeros((1, 3, z.shape[2] * 8, z.shape[3] * 8))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, CFG.context_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.pooled_dim))
    nega = jax.random.normal(jax.random.PRNGKey(3), (1, 8, CFG.context_dim))
    pipe.encode_prompt = lambda p, n=512: (
        (nega, pooled, np.zeros((8, 3))) if p == "bad"
        else (ctx, pooled, np.zeros((8, 3))))
    return pipe


def test_flux_t2i_and_img2img():
    pipe = _tiny_pipe()
    lat = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
               return_latents=True)
    assert lat.shape == (1, 16, 4, 4)
    assert bool(jnp.isfinite(lat).all())
    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    lat2 = pipe("a cat", input_image=img, denoising_strength=0.6, height=32,
                width=32, seed=0, num_inference_steps=2, return_latents=True)
    assert bool(jnp.isfinite(lat2).all())
    assert float(jnp.abs(lat - lat2).mean()) > 1e-6


def test_flux_cfg_two_pass_differs():
    pipe = _tiny_pipe()
    a = pipe("a cat", negative_prompt="bad", cfg_scale=2.0, height=32,
             width=32, seed=0, num_inference_steps=2, return_latents=True)
    b = pipe("a cat", cfg_scale=1.0, height=32, width=32, seed=0,
             num_inference_steps=2, return_latents=True)
    assert float(jnp.abs(a - b).mean()) > 1e-6


def test_flux_kontext_conditions_output():
    pipe = _tiny_pipe()
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8))
    a = pipe("a cat", kontext_images=img, height=32, width=32, seed=0,
             num_inference_steps=2, return_latents=True)
    b = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             return_latents=True)
    assert a.shape == b.shape
    assert float(jnp.abs(a - b).mean()) > 1e-6


def test_flux_teacache_runs_and_skips():
    pipe = _tiny_pipe()
    lat = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=4,
               tea_cache_l1_thresh=1e9, return_latents=True)
    assert bool(jnp.isfinite(lat).all())


def test_flux_embedded_guidance_changes_output():
    pipe = _tiny_pipe()
    a = pipe("a cat", embedded_guidance=1.0, height=32, width=32, seed=0,
             num_inference_steps=2, return_latents=True)
    b = pipe("a cat", embedded_guidance=7.0, height=32, width=32, seed=0,
             num_inference_steps=2, return_latents=True)
    assert float(jnp.abs(a - b).mean()) > 1e-6


# ---------------------------------------------------------------- LoRA

def _rand_lora(rng, d_out, d_in, r=2):
    return (rng.standard_normal((r, d_in)).astype(np.float32),
            rng.standard_normal((d_out, r)).astype(np.float32))


def test_flux_lora_civitai_format_merges():
    rng = np.random.default_rng(0)
    d = CFG.dim
    A, B = _rand_lora(rng, 3 * d, d)
    sd = {
        "lora_unet_double_blocks_1_img_attn_qkv.lora_down.weight": A,
        "lora_unet_double_blocks_1_img_attn_qkv.lora_up.weight": B,
    }
    converted = convert_flux_lora(sd)
    assert "blocks.1.attn.a_to_qkv.lora_A.weight" in converted
    params = init_flux_dit(jax.random.PRNGKey(0), CFG)
    merged = merge_lora(params, converted, alpha=1.0)
    w0 = np.asarray(params["blocks"]["attn"]["a_to_qkv"]["w"])
    w1 = np.asarray(merged["blocks"]["attn"]["a_to_qkv"]["w"])
    np.testing.assert_allclose(w1[1] - w0[1], (B @ A).T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(w1[0], w0[0], rtol=0, atol=0)  # other block untouched


def test_flux_lora_diffusers_qkv_fusion():
    """Separate diffusers q/k/v adapters fuse block-diagonally: the merged
    fused-qkv delta equals per-projection deltas applied to each slice."""
    rng = np.random.default_rng(1)
    d = CFG.dim
    sd = {}
    deltas = {}
    for i, proj in enumerate(["to_q", "to_k", "to_v"]):
        A, B = _rand_lora(rng, d, d)
        sd[f"transformer.transformer_blocks.0.attn.{proj}.lora_A.weight"] = A
        sd[f"transformer.transformer_blocks.0.attn.{proj}.lora_B.weight"] = B
        deltas[i] = (B @ A).T
    converted = convert_flux_lora(sd)
    assert "blocks.0.attn.a_to_qkv.lora_A.weight" in converted
    params = init_flux_dit(jax.random.PRNGKey(0), CFG)
    merged = merge_lora(params, converted, alpha=1.0)
    w0 = np.asarray(params["blocks"]["attn"]["a_to_qkv"]["w"])[0]
    w1 = np.asarray(merged["blocks"]["attn"]["a_to_qkv"]["w"])[0]
    for i in range(3):
        np.testing.assert_allclose(w1[:, i * d:(i + 1) * d] - w0[:, i * d:(i + 1) * d],
                                   deltas[i], rtol=1e-4, atol=1e-5)


def test_flux_lora_single_block_qkv_mlp_fusion():
    rng = np.random.default_rng(2)
    d = CFG.dim
    sd = {}
    for proj in ["to_q", "to_k", "to_v"]:
        A, B = _rand_lora(rng, d, d)
        sd[f"transformer.single_transformer_blocks.1.attn.{proj}.lora_A.weight"] = A
        sd[f"transformer.single_transformer_blocks.1.attn.{proj}.lora_B.weight"] = B
    A, B = _rand_lora(rng, 4 * d, d)
    sd["transformer.single_transformer_blocks.1.proj_mlp.lora_A.weight"] = A
    sd["transformer.single_transformer_blocks.1.proj_mlp.lora_B.weight"] = B
    converted = convert_flux_lora(sd)
    assert "single_blocks.1.to_qkv_mlp.lora_A.weight" in converted
    a = converted["single_blocks.1.to_qkv_mlp.lora_A.weight"]
    b = converted["single_blocks.1.to_qkv_mlp.lora_B.weight"]
    assert a.shape == (8, d)            # 4 adapters x rank 2 rows
    assert b.shape == (7 * d, 8)        # qkv (3d) + mlp (4d), block-diagonal
    params = init_flux_dit(jax.random.PRNGKey(0), CFG)
    merged = merge_lora(params, converted, alpha=1.0)
    assert bool(jnp.isfinite(merged["single_blocks"]["to_qkv_mlp"]["w"]).all())


def test_flux_lora_alpha_rescale():
    rng = np.random.default_rng(3)
    d = CFG.dim
    A, B = _rand_lora(rng, 3 * d, d, r=4)
    sd = {
        "lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight": A,
        "lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight": B,
        "lora_unet_double_blocks_0_img_attn_qkv.alpha": np.asarray(2.0),
    }
    converted = convert_flux_lora(sd)
    scale = np.sqrt(2.0 / 4)
    np.testing.assert_allclose(
        converted["blocks.0.attn.a_to_qkv.lora_A.weight"], A * scale,
        rtol=1e-6, atol=1e-6)


def test_flux_controlnet_conditions_output():
    import video_styler_tpu.models.flux_controlnet as FC
    pipe = _tiny_pipe()
    cfg = FC.FluxControlNetConfig(dit=CFG, num_joint_blocks=1,
                                  num_single_blocks=1)
    pipe.controlnet_cfg = cfg
    pipe.controlnet_params = FC.init_flux_controlnet(jax.random.PRNGKey(5),
                                                     cfg)
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (32, 32, 3), np.uint8))
    a = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             controlnet_image=img, return_latents=True)
    b = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             return_latents=True)
    assert bool(jnp.isfinite(a).all())
    assert float(jnp.abs(a - b).mean()) > 1e-6
    # scale=0 controlnet == no controlnet
    c = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             controlnet_image=img, controlnet_scale=0.0, return_latents=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=1e-5)


def test_flux_ipadapter_conditions_output():
    import video_styler_tpu.models.flux_controlnet as FC
    pipe = _tiny_pipe()
    n = CFG.num_joint_blocks + CFG.num_single_blocks
    pipe.ipadapter_params = FC.init_flux_ipadapter(
        jax.random.PRNGKey(6), CFG, num_tokens=4, num_blocks=n)
    pipe.ipadapter_image_encoder = lambda imgs: np.ones((len(imgs), 1152),
                                                        np.float32)
    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 255, (32, 32, 3), np.uint8))
    a = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             ipadapter_images=img, return_latents=True)
    b = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             return_latents=True)
    assert bool(jnp.isfinite(a).all())
    assert float(jnp.abs(a - b).mean()) > 1e-6


def test_flux_eligen_conditions_output():
    pipe = _tiny_pipe()
    img = Image.fromarray(np.zeros((32, 32), np.uint8))
    mask = Image.fromarray(
        (np.arange(32)[:, None] < 16).astype(np.uint8) * 255)
    a = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             eligen_entity_prompts=["red hat"], eligen_entity_masks=[mask],
             return_latents=True)
    b = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             return_latents=True)
    assert bool(jnp.isfinite(a).all())
    assert float(jnp.abs(a - b).mean()) > 1e-6
