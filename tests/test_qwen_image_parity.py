"""Golden parity: Qwen-Image DiT + VAE vs the reference modules
(/root/reference/diffsynth/models/qwen_image_dit.py, qwen_image_vae.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.qwen_image_dit import (
    QWEN_IMAGE_TINY, init_qwen_image_dit, convert_qwen_image_dit,
    qwen_image_dit_forward, qwen_rope)
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = QWEN_IMAGE_TINY


def _tiny_ref_dit():
    import torch
    ref = load_ref("models.qwen_image_dit")
    d, heads, hd = CFG.dim, CFG.num_heads, CFG.head_dim

    class TinyQwenDiT(ref.QwenImageDiT):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.pos_embed = ref.QwenEmbedRope(theta=CFG.theta,
                                               axes_dim=list(CFG.axes_dim),
                                               scale_rope=True)
            self.time_text_embed = ref.TimestepEmbeddings(
                CFG.time_freq_dim, d, diffusers_compatible_format=True,
                scale=1000, align_dtype_to_timestep=True)
            self.txt_norm = ref.RMSNorm(CFG.text_dim, eps=1e-6)
            self.img_in = torch.nn.Linear(CFG.in_dim, d)
            self.txt_in = torch.nn.Linear(CFG.text_dim, d)
            self.transformer_blocks = torch.nn.ModuleList([
                ref.QwenImageTransformerBlock(dim=d, num_attention_heads=heads,
                                              attention_head_dim=hd)
                for _ in range(CFG.num_layers)])
            self.norm_out = ref.AdaLayerNorm(d, single=True)
            self.proj_out = torch.nn.Linear(d, CFG.in_dim)

    torch.manual_seed(0)
    return TinyQwenDiT().eval()


def test_qwen_rope_parity():
    import torch
    ref = load_ref("models.qwen_image_dit")
    emb = ref.QwenEmbedRope(theta=CFG.theta, axes_dim=list(CFG.axes_dim),
                            scale_rope=True)
    want_img, want_txt = emb([(1, 5, 6)], [7], device="cpu")
    ic, isin, tc, tsin = qwen_rope(CFG, [(1, 5, 6)], 7)
    np.testing.assert_allclose(ic, want_img.real.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(isin, want_img.imag.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tc, want_txt.real.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tsin, want_txt.imag.numpy(), rtol=1e-5, atol=1e-6)


def test_qwen_dit_forward_parity():
    import torch
    model = _tiny_ref_dit()
    params = convert_qwen_image_dit(model.state_dict(), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((1, 16, 16, 16)).astype(np.float32)
    t = np.asarray([0.5], np.float32)       # pipeline passes t/1000
    prompt = rng.standard_normal((1, 7, CFG.text_dim)).astype(np.float32)
    mask = torch.ones(1, 7, dtype=torch.long)
    with torch.no_grad():
        want = model(latents=torch.from_numpy(lat), timestep=torch.from_numpy(t),
                     prompt_emb=torch.from_numpy(prompt),
                     prompt_emb_mask=mask, height=128, width=128)
    # the reference forward returns patchified tokens (B, S, 64)
    want = want.numpy()
    got = np.asarray(qwen_image_dit_forward(
        params, CFG, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(prompt)),
        np.float32)
    from einops import rearrange
    got_tokens = rearrange(got, "B C (H P) (W Q) -> B (H W) (C P Q)", P=2, Q=2)
    np.testing.assert_allclose(got_tokens, want, rtol=3e-4, atol=3e-4)


def test_qwen_vae_reuses_wan_architecture():
    """QwenImageVAE is the Wan2.1 VAE with diffusers key names: rename and
    run our wan_vae forward against the reference module."""
    import torch
    import video_styler_tpu.models.wan_vae as V
    from video_styler_tpu.models.qwen_image_vae import (
        convert_qwen_image_vae, qwen_vae_encode, qwen_vae_decode)
    ref = load_ref("models.qwen_image_vae")
    torch.manual_seed(0)
    model = ref.QwenImageVAE(base_dim=16, z_dim=4, dim_mult=[1, 2, 4, 4],
                             num_res_blocks=1).eval()
    cfg = V.WAN_VAE_TINY            # latent mean 0 / std 1 at tiny size
    # the reference's mean/std are hard-coded 16-channel; neutralize for the
    # tiny oracle (the full-size constants equal WAN21_VAE's)
    model.mean = torch.zeros(1, 1, 1, 1, 1)
    model.std = torch.ones(1, 1, 1, 1, 1)
    params = convert_qwen_image_vae(model.state_dict())

    x = np.random.default_rng(1).standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want_z = model.encode(torch.from_numpy(x)).numpy()
    # tiny z=4: the reference slices [:16] (full-size z) so it returns 2*z
    # channels; compare the first z
    got_z = np.asarray(qwen_vae_encode(params, jnp.asarray(x), cfg), np.float32)
    np.testing.assert_allclose(got_z, want_z[:, :4], rtol=2e-3, atol=2e-4)

    with torch.no_grad():
        want_y = model.decode(torch.from_numpy(want_z[:, :4])).numpy()
    got_y = np.asarray(qwen_vae_decode(params, jnp.asarray(got_z), cfg),
                       np.float32)
    np.testing.assert_allclose(got_y, want_y, rtol=2e-3, atol=2e-3)
