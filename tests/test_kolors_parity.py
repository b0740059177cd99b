"""Golden parity: Kolors ChatGLM text encoder vs the reference ChatGLMModel
(/root/reference/diffsynth/models/kolors_text_encoder.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.kolors_text_encoder as K
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = K.CHATGLM_TINY


def _tiny_ref_model():
    import torch
    ref = load_ref("models.kolors_text_encoder")
    cfg = ref.ChatGLMConfig(
        num_layers=CFG.num_layers, padded_vocab_size=CFG.padded_vocab_size,
        hidden_size=CFG.hidden_size, ffn_hidden_size=CFG.ffn_hidden_size,
        kv_channels=CFG.kv_channels, num_attention_heads=CFG.num_heads,
        seq_length=CFG.seq_length, multi_query_attention=True,
        multi_query_group_num=CFG.multi_query_group_num,
        add_qkv_bias=True, original_rope=True, rmsnorm=True,
        apply_residual_connection_post_layernorm=False,
        attention_dropout=0.0, hidden_dropout=0.0, torch_dtype=torch.float32,
        use_cache=False)
    torch.manual_seed(0)
    return ref.ChatGLMModel(cfg, empty_init=False).eval()


@pytest.mark.parametrize("with_padding", [False, True])
def test_chatglm_hidden_states_parity(with_padding):
    import torch
    model = _tiny_ref_model()
    params = K.convert_chatglm(model.state_dict(), CFG, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, CFG.padded_vocab_size, (2, 12)).astype(np.int64)
    mask = np.ones_like(ids)
    if with_padding:
        mask[1, :4] = 0          # ChatGLM pads on the left
    pos = np.broadcast_to(np.arange(12, dtype=np.int64), (2, 12)).copy()
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    position_ids=torch.from_numpy(pos),
                    output_hidden_states=True)
    # reference runs seq-first (s, b, h)
    want_states = [h.permute(1, 0, 2).numpy() for h in out.hidden_states]
    got_states = K.chatglm_forward(params, CFG, jnp.asarray(ids),
                                   jnp.asarray(mask))
    assert len(got_states) == len(want_states)
    for got, want in zip(got_states, want_states):
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   rtol=3e-4, atol=3e-4)


def test_kolors_encode_outputs():
    import torch
    model = _tiny_ref_model()
    params = K.convert_chatglm(model.state_dict(), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, CFG.padded_vocab_size, (1, 8)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    position_ids=torch.from_numpy(
                        np.arange(8, dtype=np.int64)[None]),
                    output_hidden_states=True)
        want_emb = out.hidden_states[-2].permute(1, 0, 2).numpy()
        want_pool = out.hidden_states[-1][-1, :, :].numpy()
    emb, pooled = K.kolors_encode(params, CFG, jnp.asarray(ids),
                                  jnp.asarray(mask), clip_skip=2)
    np.testing.assert_allclose(np.asarray(emb), want_emb, rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(pooled), want_pool, rtol=3e-4,
                               atol=3e-4)


def test_sdxl_pipeline_kolors_prompt_path():
    """Kolors encoder plugs into the SDXL pipeline's encode_prompt."""
    import jax
    from video_styler_tpu.pipelines.sdxl_image import SDXLImagePipeline
    pipe = SDXLImagePipeline()
    params = K.init_chatglm(jax.random.PRNGKey(0), CFG)
    pipe.fetch_kolors_text_encoder(params, CFG)
    ctx, pooled = pipe.encode_prompt("a cat")
    assert ctx.shape == (1, 77, CFG.hidden_size)
    assert pooled.shape == (1, CFG.hidden_size)
    assert bool(jnp.isfinite(ctx).all()) and bool(jnp.isfinite(pooled).all())
