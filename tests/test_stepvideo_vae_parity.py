"""Golden parity: StepVideo VAE (version 2) vs the reference modules
(/root/reference/diffsynth/models/stepvideo_vae.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.stepvideo_vae as SV
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = SV.STEP_VAE_TINY


def _tiny_ref():
    import torch
    ref = load_ref("models.stepvideo_vae")
    ref.base_group_norm.spatial = True          # version 2 semantics
    torch.manual_seed(0)
    enc = ref.VideoEncoder(z_channels=CFG.z_channels,
                           num_res_blocks=CFG.num_res_blocks,
                           version=2).eval()
    dec = ref.VideoDecoder(z_channels=CFG.z_channels,
                           num_res_blocks=CFG.num_res_blocks,
                           version=2).eval()
    return ref, enc, dec


def test_step_vae_encoder_parity():
    import torch
    ref, enc, dec = _tiny_ref()
    p_enc = SV.convert_step_vae(enc.state_dict())
    x = np.random.default_rng(0).standard_normal((1, 3, 17, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x), 17, True).numpy()   # (B, T, C, h, w)
    got = np.asarray(SV.encoder_forward(p_enc["encoder"]
                                        if "encoder" in p_enc else p_enc,
                                        jnp.asarray(x), CFG), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_step_vae_decoder_parity():
    import torch
    ref, enc, dec = _tiny_ref()
    p_dec = SV.convert_step_vae(dec.state_dict())
    z = np.random.default_rng(1).standard_normal(
        (1, 3, CFG.z_channels, 2, 2)).astype(np.float32)
    with torch.no_grad():
        want = dec(torch.from_numpy(z), True).numpy()
    got = np.asarray(SV.decoder_forward(p_dec["decoder"]
                                        if "decoder" in p_dec else p_dec,
                                        jnp.asarray(z), CFG), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
