"""Golden parity: shared decoder-LM tower vs transformers Llama/Qwen2.

Validates the native replacement for the two towers the reference serves
through transformers (hunyuan_video_text_encoder.py:6-49 LlamaModel subclass
with hidden_state_skip_layer; qwen_image_text_encoder.py:1-255 Qwen2.5-VL —
whose text-only path is numerically Qwen2: mRoPE position streams are all
arange for pure-text input).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.llm_decoder import (
    DecoderLMConfig, DECODER_LM_TINY, decoder_lm_forward, convert_decoder_lm,
    init_decoder_lm)


def _rand_weights(model, seed=0):
    import torch
    torch.manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("layernorm.weight") or name.endswith("norm.weight"):
                p.data = 1.0 + 0.1 * torch.randn_like(p.data)
            else:
                p.data = torch.randn_like(p.data) * 0.05
    return model


def _llama_tiny(cfg: DecoderLMConfig):
    import torch
    from transformers import LlamaModel, LlamaConfig
    tc = LlamaConfig(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden,
                     intermediate_size=cfg.ffn,
                     num_hidden_layers=cfg.num_layers,
                     num_attention_heads=cfg.num_heads,
                     num_key_value_heads=cfg.num_kv_heads,
                     rms_norm_eps=cfg.eps, rope_theta=cfg.rope_theta,
                     attention_bias=False,
                     attn_implementation="eager")
    return _rand_weights(LlamaModel(tc).eval())


def _qwen2_tiny(cfg: DecoderLMConfig):
    import torch
    from transformers import Qwen2Model, Qwen2Config
    tc = Qwen2Config(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden,
                     intermediate_size=cfg.ffn,
                     num_hidden_layers=cfg.num_layers,
                     num_attention_heads=cfg.num_heads,
                     num_key_value_heads=cfg.num_kv_heads,
                     rms_norm_eps=cfg.eps, rope_theta=cfg.rope_theta,
                     attn_implementation="eager")
    return _rand_weights(Qwen2Model(tc).eval())


LLAMA_TINY = DecoderLMConfig(vocab_size=128, hidden=64, num_layers=3,
                             num_heads=4, num_kv_heads=2, ffn=128,
                             rope_theta=500000.0, eps=1e-5, qkv_bias=False)
QWEN_TINY = DecoderLMConfig(vocab_size=128, hidden=64, num_layers=3,
                            num_heads=4, num_kv_heads=2, ffn=128,
                            rope_theta=1000000.0, eps=1e-6, qkv_bias=True)


def test_llama_last_hidden_parity():
    import torch
    model = _llama_tiny(LLAMA_TINY)
    params = convert_decoder_lm(model.state_dict(), LLAMA_TINY,
                                dtype=jnp.float32)
    torch.manual_seed(1)
    ids = torch.randint(0, 128, (2, 10))
    mask = torch.ones_like(ids)
    mask[1, 7:] = 0
    with torch.no_grad():
        want = model(input_ids=ids, attention_mask=mask
                     ).last_hidden_state.numpy()
    got = np.asarray(decoder_lm_forward(params, LLAMA_TINY,
                                        jnp.asarray(ids.numpy()),
                                        jnp.asarray(mask.numpy())))
    # pad rows diverge by construction; compare the real tokens
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1, :7], want[1, :7], rtol=2e-4, atol=2e-5)


def test_llama_skip_layer_semantics():
    """hidden_state_skip_layer=2: layers [0..n-3], NO final norm — the exact
    break condition of hunyuan_video_text_encoder.py:33-49."""
    import torch
    model = _llama_tiny(LLAMA_TINY)
    params = convert_decoder_lm(model.state_dict(), LLAMA_TINY,
                                dtype=jnp.float32)
    torch.manual_seed(2)
    ids = torch.randint(0, 128, (1, 8))
    mask = torch.ones_like(ids)
    with torch.no_grad():
        hs = model(input_ids=ids, attention_mask=mask,
                   output_hidden_states=True).hidden_states
    # skip=2 with 3 layers -> run layer 0 only -> hidden_states[1]
    want = hs[1].numpy()
    got = np.asarray(decoder_lm_forward(params, LLAMA_TINY,
                                        jnp.asarray(ids.numpy()),
                                        jnp.asarray(mask.numpy()),
                                        stop_skip_layers=2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_qwen2_parity_with_bias():
    import torch
    model = _qwen2_tiny(QWEN_TINY)
    params = convert_decoder_lm(model.state_dict(), QWEN_TINY,
                                dtype=jnp.float32)
    torch.manual_seed(3)
    ids = torch.randint(0, 128, (2, 12))
    mask = torch.ones_like(ids)
    mask[0, 9:] = 0
    with torch.no_grad():
        want = model(input_ids=ids, attention_mask=mask
                     ).last_hidden_state.numpy()
    got = np.asarray(decoder_lm_forward(params, QWEN_TINY,
                                        jnp.asarray(ids.numpy()),
                                        jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(got[0, :9], want[0, :9], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-5)


def test_prefix_stripping():
    """Converters accept LlamaForCausalLM-style 'model.' and Qwen2.5-VL
    'model.language_model.' prefixed state dicts."""
    model = _llama_tiny(LLAMA_TINY)
    sd = model.state_dict()
    for pre in ("model.", "model.language_model."):
        sd2 = {pre + k: v for k, v in sd.items()}
        p = convert_decoder_lm(sd2, LLAMA_TINY, dtype=jnp.float32)
        assert p["embed"].shape == (128, 64)


def test_init_runs():
    cfg = DECODER_LM_TINY
    params = init_decoder_lm(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(6)[None] % cfg.vocab_size
    out = decoder_lm_forward(params, cfg, ids)
    assert out.shape == (1, 6, cfg.hidden)
    assert bool(jnp.isfinite(out).all())


def test_safetensors_roundtrip_and_detect(tmp_path):
    """The pipeline fetch path: state dict -> safetensors file ->
    load_state_dict_files -> detect_decoder_lm_config -> convert."""
    import torch
    from video_styler_tpu.models.llm_decoder import detect_decoder_lm_config
    from video_styler_tpu.utils import ckpt as C
    # head_dim 128 (the detectors' family-wide constant) -> hidden 256 = 2 heads
    cfg = DecoderLMConfig(vocab_size=64, hidden=256, num_layers=2,
                          num_heads=2, num_kv_heads=1, ffn=96,
                          rope_theta=500000.0, eps=1e-5, qkv_bias=False)
    model = _llama_tiny(cfg)
    sd = {("model." + k): v for k, v in model.state_dict().items()}
    from safetensors.torch import save_file
    f = str(tmp_path / "llm.safetensors")
    save_file(sd, f)
    loaded = C.load_state_dict_files([f])
    det = detect_decoder_lm_config(loaded, family="llama")
    assert (det.hidden, det.num_layers, det.num_heads, det.num_kv_heads,
            det.ffn) == (256, 2, 2, 1, 96)
    params = convert_decoder_lm(loaded, det, dtype=jnp.float32)
    torch.manual_seed(5)
    ids = torch.randint(0, 64, (1, 9))
    with torch.no_grad():
        want = model(input_ids=ids,
                     attention_mask=torch.ones_like(ids)).last_hidden_state
    got = np.asarray(decoder_lm_forward(params, det, jnp.asarray(ids.numpy()),
                                        jnp.ones((1, 9), jnp.int32)))
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-5)
