"""Golden parity: OmniGen (Phi-3 diffusion backbone) vs HF Phi3Model + the
reference embedder modules (/root/reference/diffsynth/models/omnigen.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import video_styler_tpu.models.omnigen as O
from ref_loader import ref_available, load_ref

CFG = O.OMNIGEN_TINY
SU_SHORT = np.asarray([1.0, 1.1, 1.2, 1.3])


def _phi3_config():
    from transformers import Phi3Config
    return Phi3Config(
        hidden_size=CFG.hidden_size, intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_heads, vocab_size=CFG.vocab_size,
        max_position_embeddings=CFG.max_pos,
        original_max_position_embeddings=CFG.original_max_pos,
        pad_token_id=0, rms_norm_eps=CFG.rms_eps,
        rope_scaling={"type": "su", "short_factor": list(SU_SHORT),
                      "long_factor": [2.0] * 4})


def _full_state_dict(llm):
    """Assemble an OmniGen-layout state dict from an HF Phi3Model + random
    torch embedder weights."""
    torch.manual_seed(1)
    sd = {f"llm.{k}": v for k, v in llm.state_dict().items()}
    d = CFG.hidden_size
    sd["x_embedder.proj.weight"] = torch.randn(d, 4, 2, 2) * 0.1
    sd["x_embedder.proj.bias"] = torch.randn(d) * 0.1
    sd["input_x_embedder.proj.weight"] = torch.randn(d, 4, 2, 2) * 0.1
    sd["input_x_embedder.proj.bias"] = torch.randn(d) * 0.1
    for name in ("time_token", "t_embedder"):
        sd[f"{name}.mlp.0.weight"] = torch.randn(d, 256) * 0.05
        sd[f"{name}.mlp.0.bias"] = torch.zeros(d)
        sd[f"{name}.mlp.2.weight"] = torch.randn(d, d) * 0.05
        sd[f"{name}.mlp.2.bias"] = torch.zeros(d)
    sd["final_layer.adaLN_modulation.1.weight"] = torch.randn(2 * d, d) * 0.05
    sd["final_layer.adaLN_modulation.1.bias"] = torch.zeros(2 * d)
    sd["final_layer.linear.weight"] = torch.randn(16, d) * 0.05
    sd["final_layer.linear.bias"] = torch.zeros(16)
    return sd


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_omnigen_forward_parity():
    """Compose the reference forward by hand (omnigen.py:717-758): reference
    embedder modules + HF Phi3Model with the custom 4-D mask."""
    from transformers import Phi3Model
    ref = load_ref("models.omnigen")
    torch.manual_seed(0)
    llm = Phi3Model(_phi3_config()).eval()
    sd = _full_state_dict(llm)
    params = O.convert_omnigen(sd, CFG, dtype=jnp.float32)

    # inputs: text(5) + ref image tokens(4 for 8x8 latent) + time + image(4)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    ref_lat = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    ids = rng.integers(2, CFG.vocab_size, (1, 9)).astype(np.int64)
    image_sizes = {0: [[3, 7]]}     # 4 ref tokens spliced at [3, 7)
    text_len = 9
    img_tokens = 4
    s = text_len + 1 + img_tokens
    mask = np.zeros((1, s, s), np.int64)
    mask[0, :text_len + 1, :text_len + 1] = np.tril(np.ones((text_len + 1,
                                                             text_len + 1)))
    mask[0, 3:7, 3:7] = 1
    mask[0, text_len + 1:] = 1
    pos = np.arange(s, dtype=np.int64)[None]
    t = np.asarray([400.0], np.float32)

    # torch composition
    pe = ref.get_2d_sincos_pos_embed(CFG.hidden_size, CFG.pos_embed_max_size,
                                     interpolation_scale=1.0, base_size=64)
    pe = torch.from_numpy(pe).float().reshape(CFG.pos_embed_max_size,
                                              CFG.pos_embed_max_size, -1)

    def crop(hh, ww):
        h_, w_ = hh // 2, ww // 2
        top = (CFG.pos_embed_max_size - h_) // 2
        left = (CFG.pos_embed_max_size - w_) // 2
        return pe[top:top + h_, left:left + w_].reshape(1, h_ * w_, -1)

    def patch_embed(w, b, lat):
        out = torch.nn.functional.conv2d(torch.from_numpy(lat), w, b,
                                         stride=2)
        return out.flatten(2).transpose(1, 2)

    with torch.no_grad():
        tok = patch_embed(sd["x_embedder.proj.weight"],
                          sd["x_embedder.proj.bias"], x) + crop(4, 4)
        ref_tok = patch_embed(sd["input_x_embedder.proj.weight"],
                              sd["input_x_embedder.proj.bias"],
                              ref_lat) + crop(4, 4)

        def t_embed(prefix, tt):
            half = 128
            freqs = torch.exp(-np.log(10000) * torch.arange(half) / half)
            args = torch.from_numpy(tt)[:, None] * freqs[None]
            emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
            h = torch.nn.functional.linear(emb, sd[f"{prefix}.mlp.0.weight"],
                                           sd[f"{prefix}.mlp.0.bias"])
            return torch.nn.functional.linear(
                torch.nn.functional.silu(h), sd[f"{prefix}.mlp.2.weight"],
                sd[f"{prefix}.mlp.2.bias"])

        time_token = t_embed("time_token", t)[:, None]
        cond = llm.embed_tokens(torch.from_numpy(ids)).clone()
        cond[0, 3:7] = ref_tok[0]
        inp = torch.cat([cond, time_token, tok], dim=1)
        fmask = (1 - torch.from_numpy(mask).float()) \
            * torch.finfo(torch.float32).min
        out = llm(inputs_embeds=inp, attention_mask=fmask.unsqueeze(1),
                  position_ids=torch.from_numpy(pos)).last_hidden_state
        img = out[:, -img_tokens:]
        temb = t_embed("t_embedder", t)
        m = torch.nn.functional.linear(
            torch.nn.functional.silu(temb),
            sd["final_layer.adaLN_modulation.1.weight"],
            sd["final_layer.adaLN_modulation.1.bias"])
        shift, scale = m.chunk(2, dim=1)
        img = torch.nn.functional.layer_norm(img, (CFG.hidden_size,)) \
            * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
        img = torch.nn.functional.linear(img, sd["final_layer.linear.weight"],
                                         sd["final_layer.linear.bias"])
        img = img.reshape(1, 2, 2, 2, 2, 4)
        want = torch.einsum("nhwpqc->nchpwq", img).reshape(1, 4, 4, 4).numpy()

    got = np.asarray(O.omnigen_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ids),
        [jnp.asarray(ref_lat)], image_sizes, jnp.asarray(mask),
        position_ids=pos, su_factor=SU_SHORT), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_longrope_tables_match_hf():
    from transformers import Phi3Model
    torch.manual_seed(0)
    llm = Phi3Model(_phi3_config()).eval()
    pos = np.arange(12, dtype=np.int64)[None]
    cos, sin = O.longrope_tables(CFG, pos, SU_SHORT)
    with torch.no_grad():
        hf_cos, hf_sin = llm.rotary_emb(torch.zeros(1, 12, CFG.hidden_size),
                                        torch.from_numpy(pos))
    np.testing.assert_allclose(cos[0], hf_cos[0].numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(sin[0], hf_sin[0].numpy(), rtol=1e-5,
                               atol=1e-6)


def test_prompter_mask_and_positions():
    from video_styler_tpu.prompters.omnigen_prompter import OmniGenPrompter

    class Tok:
        def __call__(self, text):
            import types
            return types.SimpleNamespace(
                input_ids=[1] + [5] * (len(text.split()) % 7 + 2))

    p = OmniGenPrompter(Tok())
    branches = p("a cat <img><|image_1|></img>", [(32, 32)], height=64,
                 width=64)
    assert len(branches) == 3
    cond = branches[0]
    text_len = cond["input_ids"].shape[1]
    s = text_len + 1 + 64 * 64 // 256
    assert cond["attention_mask"].shape == (1, s, s)
    assert cond["position_ids"].shape == (1, s)
    start, end = cond["image_sizes"][0][0]
    assert end - start == 32 * 32 // 256
    # image rows attend everywhere; text rows are causal
    m = cond["attention_mask"][0]
    assert m[-1].sum() == s
    assert m[0, 1:].sum() == 0
    # spliced reference-image block is bidirectional
    assert m[start, end - 1] == 1


def test_omnigen_pipeline_e2e():
    from video_styler_tpu.pipelines.omnigen_image import OmnigenImagePipeline
    from PIL import Image

    pipe = OmnigenImagePipeline(dtype=jnp.float32)
    pipe.cfg = CFG
    pipe.su_factor = SU_SHORT
    pipe.transformer_params = O.init_omnigen(jax.random.PRNGKey(0), CFG)

    class Tok:
        def __call__(self, text):
            import types
            return types.SimpleNamespace(
                input_ids=[1] + [5] * (len(text) % 5 + 2))

    pipe.prompter.tokenizer = Tok()
    pipe.encode_image = lambda arr: jnp.asarray(
        np.repeat(arr[:, :1], 4, 1)[:, :, ::8, ::8], jnp.float32)
    pipe.decode_image = lambda z: jnp.zeros((1, 3, z.shape[2] * 8,
                                             z.shape[3] * 8))

    lat = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
               return_latents=True)
    assert lat.shape == (1, 4, 4, 4)
    assert bool(jnp.isfinite(lat).all())

    ref_img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (32, 32, 3), np.uint8))
    lat2 = pipe("edit <img><|image_1|></img>", reference_images=[ref_img],
                height=32, width=32, seed=0, num_inference_steps=2,
                return_latents=True)
    assert bool(jnp.isfinite(lat2).all())
    assert float(jnp.abs(lat - lat2).mean()) > 1e-6
