"""HunyuanDiT image: CLIP-BERT text encoder parity + tiny pipeline e2e."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.hunyuan_image_dit as H
from video_styler_tpu.pipelines.hunyuan_image import HunyuanImagePipeline

CFG = H.HUNYUAN_DIT_TINY


def test_hunyuan_bert_parity():
    import torch
    from transformers import BertModel, BertConfig
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=16, hidden_act="gelu",
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(cfg, add_pooling_layer=False).eval()
    params = H.convert_hunyuan_bert(model.state_dict(), num_layers=2,
                                    dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, (2, 10)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 6:] = 0
    with torch.no_grad():
        out = model(torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    output_hidden_states=True)
        want_last = out.last_hidden_state.numpy()
        want_skip2 = out.hidden_states[-2].numpy()
    got = np.asarray(H.hunyuan_bert_forward(params, jnp.asarray(ids),
                                            jnp.asarray(mask), clip_skip=1,
                                            num_heads=4), np.float32)
    np.testing.assert_allclose(got, want_last, rtol=2e-4, atol=2e-4)
    # clip_skip=2 path: renormalized layer -2 (hunyuan_dit_text_encoder:74-79)
    got2 = np.asarray(H.hunyuan_bert_forward(params, jnp.asarray(ids),
                                             jnp.asarray(mask), clip_skip=2,
                                             num_heads=4), np.float32)
    want2 = ((want_skip2 - want_skip2.mean()) / want_skip2.std(ddof=1)
             * want_last.std(ddof=1) + want_last.mean())
    np.testing.assert_allclose(got2, want2, rtol=2e-3, atol=2e-3)


def _tiny_pipe():
    pipe = HunyuanImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = CFG
    pipe.dit_params = H.init_hunyuan_image_dit(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)

    def enc(prompt, clip_skip=1, clip_skip_2=1):
        r = np.random.default_rng(abs(hash(prompt)) % 2 ** 31)
        return {
            "text_emb": jnp.asarray(r.standard_normal(
                (1, CFG.text_length, CFG.text_dim)), jnp.float32),
            "text_emb_t5": jnp.asarray(r.standard_normal(
                (1, CFG.t5_length, CFG.t5_dim)), jnp.float32),
            "text_emb_mask": jnp.ones((1, CFG.text_length), jnp.int32),
            "text_emb_mask_t5": jnp.ones((1, CFG.t5_length), jnp.int32),
        }

    pipe.encode_prompt = enc
    return pipe


def test_hunyuan_image_pipeline_e2e():
    pipe = _tiny_pipe()
    lat = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=3,
               cfg_scale=2.0, return_latents=True)
    assert lat.shape == (1, 4, 4, 4)
    assert bool(jnp.isfinite(lat).all())
    lat2 = pipe("a dog", height=32, width=32, seed=0, num_inference_steps=3,
                cfg_scale=2.0, return_latents=True)
    assert float(jnp.abs(lat - lat2).mean()) > 1e-6
