"""Golden parity: Qwen-Image block-wise ControlNet vs the reference module
(/root/reference/diffsynth/models/qwen_image_controlnet.py), plus its
scan-fused integration in the DiT forward and the pipeline gating."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.qwen_image_controlnet import (
    qwen_blockwise_cn_process, qwen_blockwise_cn_block,
    convert_qwen_blockwise_controlnet, init_qwen_blockwise_controlnet)
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def _tree_index(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


def test_blockwise_controlnet_parity():
    import torch
    from einops import rearrange as trearrange
    ref = load_ref("models.qwen_image_controlnet")
    torch.manual_seed(0)
    model = ref.QwenImageBlockWiseControlNet(num_layers=3, in_dim=64,
                                             dim=32).eval()
    params = convert_qwen_blockwise_controlnet(model.state_dict(),
                                               dtype=jnp.float32)
    torch.manual_seed(1)
    cond_lat = torch.randn(1, 16, 6, 8)       # patchify -> (1, 12, 64)
    x = torch.randn(1, 12, 32)
    with torch.no_grad():
        cond_tokens = model.process_controlnet_conditioning(
            trearrange(cond_lat, "B C (H P) (W Q) -> B (H W) (C P Q)",
                       P=2, Q=2))
        wants = [model.blockwise_forward(x, cond_tokens, i).numpy()
                 for i in range(3)]
    got_cond = qwen_blockwise_cn_process(params,
                                         jnp.asarray(cond_lat.numpy()))
    np.testing.assert_allclose(np.asarray(got_cond), cond_tokens.numpy(),
                               rtol=1e-4, atol=1e-5)
    for i in range(3):
        got = qwen_blockwise_cn_block(_tree_index(params["blocks"], i),
                                      jnp.asarray(x.numpy()), got_cond)
        np.testing.assert_allclose(np.asarray(got), wants[i],
                                   rtol=1e-4, atol=1e-5)


def test_blockwise_controlnet_in_dit_scan():
    """The scan-fused residual must change only image tokens and match a
    manual per-block application."""
    from video_styler_tpu.models.qwen_image_dit import (
        QWEN_IMAGE_TINY, init_qwen_image_dit, qwen_image_dit_forward)
    cfg = QWEN_IMAGE_TINY
    key = jax.random.PRNGKey(0)
    dit = init_qwen_image_dit(key, cfg, dtype=jnp.float32)
    cn = init_qwen_blockwise_controlnet(jax.random.PRNGKey(1),
                                        num_layers=cfg.num_layers,
                                        in_dim=cfg.in_dim, dim=cfg.dim)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 8, 8),
                            jnp.float32)
    cond_lat = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 8, 8),
                                 jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(4), (1, 6, cfg.text_dim),
                            jnp.float32) * 0.1
    t = jnp.asarray([0.5], jnp.float32)
    cond = qwen_blockwise_cn_process(cn, cond_lat)

    plain = qwen_image_dit_forward(dit, cfg, lat, t, emb)
    ctl = qwen_image_dit_forward(
        dit, cfg, lat, t, emb,
        blockwise_cn=[(cn["blocks"], cond, jnp.asarray(1.0))])
    zero = qwen_image_dit_forward(
        dit, cfg, lat, t, emb,
        blockwise_cn=[(cn["blocks"], cond, jnp.asarray(0.0))])
    assert float(jnp.abs(ctl - plain).mean()) > 1e-6
    np.testing.assert_allclose(np.asarray(zero), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_blockwise_gating():
    """start/end progress gating (qwen_image.py:37-45) through the pipeline:
    a window excluding a step zeroes that step's scale."""
    from PIL import Image
    from video_styler_tpu.pipelines.qwen_image import (QwenImagePipeline,
                                                       ControlNetInput)
    from video_styler_tpu.models.qwen_image_dit import (QWEN_IMAGE_TINY,
                                                        init_qwen_image_dit)
    pipe = QwenImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = QWEN_IMAGE_TINY
    pipe.dit_params = init_qwen_image_dit(jax.random.PRNGKey(0),
                                          QWEN_IMAGE_TINY, jnp.float32)
    pipe.blockwise_controlnets = [init_qwen_blockwise_controlnet(
        jax.random.PRNGKey(1), num_layers=QWEN_IMAGE_TINY.num_layers,
        in_dim=QWEN_IMAGE_TINY.in_dim, dim=QWEN_IMAGE_TINY.dim)]
    pipe.encode_prompt = lambda p: (
        jnp.zeros((1, 6, QWEN_IMAGE_TINY.text_dim), jnp.float32),
        np.ones((1, 6), np.int64))
    pipe.encode_image = lambda arr: jnp.asarray(
        np.random.default_rng(7).standard_normal((1, 16, 8, 8)), jnp.float32)
    ctrl = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (64, 64, 3), np.uint8))

    lat_plain = pipe("x", height=64, width=64, seed=3, cfg_scale=1.0,
                     num_inference_steps=2, return_latents=True)
    lat_ctl = pipe("x", height=64, width=64, seed=3, cfg_scale=1.0,
                   num_inference_steps=2, return_latents=True,
                   blockwise_controlnet_inputs=[
                       ControlNetInput(image=ctrl, scale=0.7)])
    lat_off = pipe("x", height=64, width=64, seed=3, cfg_scale=1.0,
                   num_inference_steps=2, return_latents=True,
                   blockwise_controlnet_inputs=[
                       ControlNetInput(image=ctrl, scale=0.7, start=-1.0,
                                       end=-2.0)])
    assert float(jnp.abs(lat_ctl - lat_plain).mean()) > 1e-6
    np.testing.assert_allclose(np.asarray(lat_off), np.asarray(lat_plain),
                               rtol=2e-5, atol=2e-6)
