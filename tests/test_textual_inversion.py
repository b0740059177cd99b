"""Textual inversion + long-prompt chunking in SDImagePipeline
(reference prompters/sd_prompter.py:25-72, base_prompter.py:6-33)."""
import numpy as np
import jax.numpy as jnp


class _Tok:
    """Minimal CLIP-ish tokenizer: whitespace words -> hashed ids, bos/eos,
    add_tokens support."""

    def __init__(self, vocab_size=64):
        self.vocab = vocab_size
        self.added = {}

    def add_tokens(self, tokens):
        for t in tokens:
            if t not in self.added:
                self.added[t] = self.vocab + len(self.added)

    def _encode_words(self, text):
        out = [1]
        for w in text.split():
            out.append(self.added.get(w, (hash(w) % 60) + 2))
        out.append(0)
        return out

    def __call__(self, texts, return_tensors=None, truncation=None,
                 padding=None, max_length=None):
        if isinstance(texts, str):
            texts = [texts]
        ids = [self._encode_words(t) for t in texts]
        if max_length is not None:
            ids = [seq[:max_length] + [0] * (max_length - len(seq))
                   for seq in ids]
        return {"input_ids": np.asarray(ids, np.int64)}


def _pipe():
    import jax
    from video_styler_tpu.pipelines.sd_image import SDImagePipeline
    pipe = SDImagePipeline(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    d, vocab = 768, 64
    enc_layer = lambda k: {
        "layer_norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "layer_norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "attn": {"to_q": {"w": jax.random.normal(k, (d, d)) * 0.02,
                          "b": jnp.zeros((d,))},
                 "to_k": {"w": jax.random.normal(k, (d, d)) * 0.02,
                          "b": jnp.zeros((d,))},
                 "to_v": {"w": jax.random.normal(k, (d, d)) * 0.02,
                          "b": jnp.zeros((d,))},
                 "to_out": {"w": jax.random.normal(k, (d, d)) * 0.02,
                            "b": jnp.zeros((d,))}},
        "fc1": {"w": jax.random.normal(k, (d, 4 * d)) * 0.02,
                "b": jnp.zeros((4 * d,))},
        "fc2": {"w": jax.random.normal(k, (4 * d, d)) * 0.02,
                "b": jnp.zeros((d,))},
    }
    pipe.text_encoder_params = {
        "token_embedding": {"weight": jax.random.normal(key, (vocab, d)) * 0.02},
        "position_embeds": jax.random.normal(key, (77, d)) * 0.02,
        "encoders": {"0": enc_layer(key)},
        "final_layer_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    pipe.num_text_layers = 1
    pipe.tokenizer = _Tok()
    return pipe


def test_textual_inversion_rows_and_keyword():
    pipe = _pipe()
    emb = np.random.default_rng(0).standard_normal((3, 768)).astype(np.float32)
    pipe.load_textual_inversions(state_dicts={"mystyle": {"emb_params": emb}})
    table = np.asarray(pipe.text_encoder_params["token_embedding"]["weight"])
    assert table.shape[0] == 64 + 3
    np.testing.assert_allclose(table[64:], emb, rtol=1e-6)
    assert "mystyle" in pipe._ti_keywords
    # the keyword expands to the 3 new tokens -> ids 64,65,66 appear
    prompt = pipe._apply_ti_keywords("a photo of mystyle")
    ids = pipe.tokenizer(prompt, return_tensors="np")["input_ids"][0]
    assert {64, 65, 66}.issubset(set(ids.tolist()))
    out = pipe.encode_prompt("a photo of mystyle")
    assert out.shape == (1, 77, 768)
    assert bool(jnp.isfinite(out).all())
    # embedding actually changes the encoding
    out_plain = pipe.encode_prompt("a photo of style")
    assert float(jnp.abs(out - out_plain).mean()) > 1e-6


def test_long_prompt_chunking():
    pipe = _pipe()
    long_prompt = " ".join(f"word{i}" for i in range(100))
    out = pipe.encode_prompt(long_prompt)
    # 102 tokens -> 2 chunks of 77 -> (1, 154, 768)
    assert out.shape == (1, 154, 768)
    short = pipe.encode_prompt("a cat")
    assert short.shape == (1, 77, 768)
