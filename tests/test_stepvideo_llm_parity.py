"""Golden parity: STEP1 caption LLM vs the reference Step1Model
(/root/reference/diffsynth/models/stepvideo_text_encoder.py:55-521) and the
native text-encoder wiring in StepVideoPipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.stepvideo_llm import (
    Step1LLMConfig, STEP1_LLM_TINY, step1_llm_forward, convert_step1_llm,
    init_step1_llm)
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def _ref_model(cfg: Step1LLMConfig):
    import torch
    from transformers.modeling_utils import PretrainedConfig
    ref = load_ref("models.stepvideo_text_encoder")
    tcfg = PretrainedConfig(
        padded_vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        hidden_dropout=0.0, fp32_residual_connection=False,
        embedding_weights_in_fp32=True, params_dtype=torch.float32,
        num_attention_heads=cfg.num_heads,
        num_attention_groups=cfg.num_groups, seq_length=64,
        use_flash_attn=True, attention_dropout=0.0,
        ffn_hidden_size=cfg.ffn_hidden, layernorm_epsilon=cfg.eps,
        num_layers=cfg.num_layers)
    model = ref.Step1Model(tcfg).eval()
    torch.manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.data = torch.randn_like(p.data) * 0.05
        for name, p in model.named_parameters():
            if name.endswith("norm.weight"):
                p.data = 1.0 + 0.1 * torch.randn_like(p.data)
    return model


def test_step1_llm_parity():
    import torch
    cfg = STEP1_LLM_TINY
    model = _ref_model(cfg)
    params = convert_step1_llm(model.state_dict(), cfg, dtype=jnp.float32)
    torch.manual_seed(1)
    ids = torch.randint(0, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(ids).transpose(0, 1).numpy()     # (S,B,H) -> (B,S,H)
    got = np.asarray(step1_llm_forward(params, cfg,
                                       jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_step1_llm_causality():
    """No positional encoding, but strictly causal: changing a later token
    must not affect earlier positions."""
    cfg = STEP1_LLM_TINY
    params = init_step1_llm(jax.random.PRNGKey(0), cfg)
    ids = np.array([[1, 2, 3, 4, 5, 6]], np.int32)
    out1 = np.asarray(step1_llm_forward(params, cfg, jnp.asarray(ids)))
    ids2 = ids.copy()
    ids2[0, -1] = 7
    out2 = np.asarray(step1_llm_forward(params, cfg, jnp.asarray(ids2)))
    np.testing.assert_allclose(out1[:, :-1], out2[:, :-1], rtol=1e-6,
                               atol=1e-6)
    assert float(np.abs(out1[:, -1] - out2[:, -1]).mean()) > 1e-6


def test_stepvideo_native_text_encoder_wiring():
    import torch
    from video_styler_tpu.pipelines.step_video import StepVideoPipeline
    from video_styler_tpu.models.hunyuan_image_dit import convert_hunyuan_bert

    # tiny bert tower (same architecture family as the fixed-size
    # HunyuanDiTCLIPTextEncoder; hunyuan_bert_forward parity is covered by
    # test_hunyuan_image_pipeline)
    from transformers import BertModel, BertConfig
    torch.manual_seed(0)
    bcfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=77)
    bert = BertModel(bcfg, add_pooling_layer=False).eval()
    clip_params = convert_hunyuan_bert(bert.state_dict(), num_layers=2,
                                       dtype=jnp.float32)

    cfg = STEP1_LLM_TINY
    step1_params = init_step1_llm(jax.random.PRNGKey(1), cfg)

    class _Tok:
        def __call__(self, texts, padding=None, max_length=None,
                     truncation=None, return_attention_mask=None,
                     return_tensors=None):
            ids = np.zeros((1, max_length), np.int64)
            n = min(len(texts[0]) + 2, max_length, 60)
            ids[0, :n] = (np.arange(1, n + 1) * 5) % 64
            mask = np.zeros((1, max_length), np.int64)
            mask[0, :n] = 1
            return {"input_ids": ids, "attention_mask": mask}

    def step1_tokenize(prompt, max_length):
        n = min(len(prompt) + 1, max_length)
        ids = np.zeros((1, max_length), np.int64)
        ids[0, :n] = (np.arange(1, n + 1) * 3) % cfg.vocab_size
        mask = np.zeros((1, max_length), np.int64)
        mask[0, :n] = 1
        return ids, mask

    pipe = StepVideoPipeline(dtype=jnp.float32)
    pipe.fetch_text_encoders(clip_params=clip_params, clip_tokenizer=_Tok(),
                             step1_params=step1_params, step1_cfg=cfg,
                             step1_tokenize=step1_tokenize,
                             llm_max_length=16, clip_num_heads=4)
    llm_emb, clip_emb, mask = pipe.text_encoder("a cat")
    assert llm_emb.shape == (1, 16, cfg.hidden_size)
    assert clip_emb.shape[1] == 77
    assert mask.shape == (1, 77 + 16)
    # left-pad of the llm mask with ones for the clip tokens
    assert int(np.asarray(mask)[0, :77].sum()) == 77
    assert bool(jnp.isfinite(llm_emb).all()) and bool(
        jnp.isfinite(clip_emb).all())
