"""Golden parity: native wav2vec2 tower + S2V audio bucketing vs HF
transformers and the reference helpers
(/root/reference/diffsynth/models/wav2vec.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.wav2vec as W
from ref_loader import ref_available, load_ref

CFG = W.WAV2VEC2_TINY


def _tiny_hf_model():
    import torch
    from transformers import Wav2Vec2Model, Wav2Vec2Config
    cfg = Wav2Vec2Config(
        hidden_size=CFG.hidden_size, num_attention_heads=CFG.num_heads,
        num_hidden_layers=CFG.num_layers,
        intermediate_size=CFG.intermediate_size,
        conv_dim=list(CFG.conv_dim), conv_kernel=list(CFG.conv_kernel),
        conv_stride=list(CFG.conv_stride),
        num_feat_extract_layers=len(CFG.conv_dim),
        num_conv_pos_embeddings=CFG.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=CFG.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, vocab_size=32)
    torch.manual_seed(0)
    return Wav2Vec2Model(cfg).eval()


def test_wav2vec_forward_parity():
    import torch
    model = _tiny_hf_model()
    params = W.convert_wav2vec(model.state_dict(), CFG)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 2000)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(wav), output_hidden_states=True)
        want = torch.stack(out.hidden_states).numpy()
    got = np.asarray(W.wav2vec_forward(params, CFG, jnp.asarray(wav)),
                     np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_normalize_waveform_matches_processor_math():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(500) * 3 + 0.5).astype(np.float32)
    got = W.normalize_waveform(wav)
    want = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_bucket_helpers_match_reference():
    import torch
    ref = load_ref("models.wav2vec")

    idx_ref = ref.get_sample_indices(30, 300, 16, 80, fixed_start=0)
    idx = W.get_sample_indices(30, 300, 16, 80, fixed_start=0)
    np.testing.assert_array_equal(idx, idx_ref)

    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 97, 16)).astype(np.float32)
    want = ref.linear_interpolation(torch.from_numpy(feats), 50, 30).numpy()
    got = W.linear_interpolation(feats, 50, 30)
    # torch computes interpolation weights in float32; we use float64
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
@pytest.mark.parametrize("m,layers", [(0, 25), (0, 1), (2, 25)])
def test_audio_embed_bucket_fps_matches_reference(m, layers):
    import torch
    ref = load_ref("models.wav2vec")

    class Stub:
        video_rate = 30
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((layers, 150, 8)).astype(np.float32)
    want, want_n = ref.WanS2VAudioEncoder.get_audio_embed_bucket_fps(
        Stub(), torch.from_numpy(emb), fps=16, batch_frames=80, m=m)
    got, got_n = W.get_audio_embed_bucket_fps(emb, fps=16, batch_frames=80,
                                              m=m)
    assert got_n == want_n
    if layers == 1:
        # reference flattens the layer axis for single-layer input
        np.testing.assert_allclose(got[:, 0], want.numpy(), rtol=1e-6)
    else:
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)


def test_audio_feats_per_inference_shapes():
    import jax
    params = W.init_wav2vec(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(4)
    wav = rng.standard_normal(16000).astype(np.float32)  # 1 s @ 16 kHz
    chunks = W.get_audio_feats_per_inference(params, CFG, wav, fps=16,
                                             batch_frames=80, m=0)
    assert all(c.shape == (1, CFG.num_layers + 1, CFG.hidden_size, 80)
               for c in chunks)
