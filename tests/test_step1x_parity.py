"""Golden parity: Step1x Qwen2Connector vs the reference
(/root/reference/diffsynth/models/step1x_connector.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.step1x as S
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = S.STEP1X_CONNECTOR_TINY


def test_step1x_connector_parity():
    import torch
    ref = load_ref("models.step1x_connector")
    torch.manual_seed(0)
    model = ref.Qwen2Connector(in_channels=CFG.in_channels,
                               hidden_size=CFG.hidden_size,
                               heads_num=CFG.num_heads, depth=CFG.depth,
                               need_CA=False, dtype=torch.float32).eval()
    # the reference zero-inits adaLN gates; randomize so the blocks act
    with torch.no_grad():
        for blk in model.S.individual_token_refiner.blocks:
            torch.nn.init.normal_(blk.adaLN_modulation[1].weight, std=0.1)
            torch.nn.init.normal_(blk.adaLN_modulation[1].bias, std=0.1)
    params = S.convert_step1x_connector(model.state_dict(), CFG,
                                        dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, CFG.in_channels)).astype(np.float32)
    t = np.asarray([0.5, 0.9], np.float32)
    mask = np.ones((2, 9), np.int64)
    mask[1, 5:] = 0
    with torch.no_grad():
        want_ctx, want_pool = model(torch.from_numpy(x),
                                    torch.from_numpy(t),
                                    torch.from_numpy(mask))
    got_ctx, got_pool = S.step1x_connector_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_ctx), want_ctx.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_pool), want_pool.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_flux_pipeline_step1x_and_flex():
    """Step1x per-step connector conditioning + Flex channel-concat control
    in the FLUX pipeline."""
    from PIL import Image
    from video_styler_tpu.models.flux_dit import FLUX_DIT_TINY, init_flux_dit
    from dataclasses import replace
    from video_styler_tpu.pipelines.flux_image import FluxImagePipeline

    D = FLUX_DIT_TINY
    pipe = FluxImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = D
    pipe.dit_params = init_flux_dit(jax.random.PRNGKey(0), D)
    pipe.encode_image = lambda arr: jnp.zeros((1, 16, 4, 4), jnp.float32)
    pipe.decode_image = lambda z: jnp.zeros((1, 3, 32, 32))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, D.pooled_dim))
    pipe.encode_prompt = lambda p, n=512: (
        jnp.zeros((1, 8, D.context_dim)), pooled, np.zeros((8, 3)))

    # Step1x: connector emits FLUX-width ctx + pooled
    cfg = S.Step1xConnectorConfig(in_channels=16, hidden_size=D.context_dim,
                                  num_heads=2, depth=1,
                                  pooled_dim=D.pooled_dim)
    pipe.step1x_connector_params = S.init_step1x_connector(
        jax.random.PRNGKey(3), cfg)
    pipe.step1x_connector_cfg = cfg
    pipe.qwenvl = lambda caps, refs: (
        np.random.default_rng(0).standard_normal((1, 6, 16)).astype(np.float32),
        np.ones((1, 6), np.int64))

    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    a = pipe("edit the cat", step1x_reference_image=img, height=32, width=32,
             seed=0, num_inference_steps=2, return_latents=True)
    b = pipe("edit the cat", height=32, width=32, seed=0,
             num_inference_steps=2, return_latents=True)
    assert bool(jnp.isfinite(a).all())
    assert float(jnp.abs(a - b).mean()) > 1e-6

    # Flex: wider x_embedder (16 latent + 4 control channels)
    from video_styler_tpu.models.flux_dit import init_flux_dit as _init
    D2 = replace(D, in_dim=(16 + 4) * 4)
    pipe2 = FluxImagePipeline(dtype=jnp.float32)
    pipe2.dit_cfg = D2
    pipe2.dit_params = _init(jax.random.PRNGKey(1), D2)
    pipe2.encode_image = pipe.encode_image
    pipe2.decode_image = pipe.decode_image
    pipe2.encode_prompt = pipe.encode_prompt
    cond = np.ones((1, 4, 4, 4), np.float32)
    uncond = np.zeros((1, 4, 4, 4), np.float32)
    c = pipe2("a cat", height=32, width=32, seed=0, num_inference_steps=2,
              flex_condition=cond, flex_uncondition=uncond,
              flex_control_stop_timestep=500.0, return_latents=True)
    assert c.shape == (1, 16, 4, 4)
    assert bool(jnp.isfinite(c).all())
