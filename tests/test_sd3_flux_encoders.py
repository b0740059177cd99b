"""Golden parity for the SD3/FLUX shared encoders: the 16-channel VAE
(sd3_vae_encoder.py / sd3_vae_decoder.py / flux_vae.py), SD3TextEncoder1
(CLIP-L, sd3_text_encoder.py:7-27), and the T5-v1.1 encoder used as
SD3TextEncoder3 / FLUX text encoder 2.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def test_sd3_vae_roundtrip_parity():
    import torch
    from video_styler_tpu.models.sd3_vae import (
        sd3_vae_encoder_forward, sd3_vae_decoder_forward, convert_sd3_vae,
        SD3_VAE, FLUX_VAE)
    enc_mod = load_ref("models.sd3_vae_encoder")
    dec_mod = load_ref("models.sd3_vae_decoder")
    torch.manual_seed(0)
    enc = enc_mod.SD3VAEEncoder().eval()
    dec = dec_mod.SD3VAEDecoder().eval()

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_z = enc(torch.from_numpy(x)).numpy()
        want_y = dec(torch.from_numpy(want_z)).numpy()

    p_enc = convert_sd3_vae(enc.state_dict())
    p_dec = convert_sd3_vae(dec.state_dict())
    got_z = np.asarray(sd3_vae_encoder_forward(p_enc, jnp.asarray(x), SD3_VAE))
    np.testing.assert_allclose(got_z, want_z, rtol=1e-3, atol=2e-4)
    got_y = np.asarray(sd3_vae_decoder_forward(p_dec, jnp.asarray(got_z), SD3_VAE))
    np.testing.assert_allclose(got_y, want_y, rtol=1e-3, atol=2e-3)

    # FLUX differs only in scale/shift (flux_vae.py:5-25)
    z3 = np.asarray(sd3_vae_encoder_forward(p_enc, jnp.asarray(x), FLUX_VAE))
    manual = (got_z / SD3_VAE.scaling_factor + SD3_VAE.shift_factor
              - FLUX_VAE.shift_factor) * FLUX_VAE.scaling_factor
    np.testing.assert_allclose(z3, manual, rtol=1e-4, atol=1e-4)


def test_sd3_text_encoder_1_parity():
    import torch
    from video_styler_tpu.models.sd3_text_encoder import (
        sd3_text_encoder_1_forward, convert_sd3_text_encoder_1)
    mod = load_ref("models.sd3_text_encoder")
    torch.manual_seed(0)
    model = mod.SD3TextEncoder1(vocab_size=128).eval()
    # tiny-fy: the module is CLIP-L sized but 12 layers of dim 768 run fine
    ids = np.random.default_rng(1).integers(0, 128, (2, 77)).astype(np.int64)
    with torch.no_grad():
        want_pooled, want_hidden = model(torch.from_numpy(ids))
    params = convert_sd3_text_encoder_1(model.state_dict())
    got_pooled, got_hidden = sd3_text_encoder_1_forward(
        params, jnp.asarray(ids), clip_skip=2)
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_hf_t5_v11_parity():
    import torch
    transformers = pytest.importorskip("transformers")
    from video_styler_tpu.models.t5 import (
        T5_V11_TINY, t5_encode, convert_hf_t5)
    cfg_hf = transformers.T5Config(
        vocab_size=128, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(cfg_hf).eval()
    ids = np.random.default_rng(2).integers(0, 128, (2, 16)).astype(np.int64)
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    params = convert_hf_t5(model.state_dict(), T5_V11_TINY, dtype=jnp.float32)
    got = np.asarray(t5_encode(params, T5_V11_TINY, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
