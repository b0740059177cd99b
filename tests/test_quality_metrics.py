"""Functional smoke of the quality-metric scorers on tiny random towers
(reference ImageQualityMetric surface: PickScore/HPS/MPS/ImageReward)."""
import numpy as np
import jax
import pytest
from PIL import Image

import video_styler_tpu.models.clip_dual as C
import video_styler_tpu.models.blip_reward as B
from video_styler_tpu.extensions.image_quality_metric import (
    HPScore, ImageRewardScore, MPScore, PickScore, get_metric,
    preprocess_metric_image)


class StubTokenizer:
    def __init__(self, vocab, eos, length):
        self.vocab, self.eos, self.length = vocab, eos, length

    def __call__(self, texts, **kw):
        rng = np.random.default_rng(abs(hash(texts[0])) % 2 ** 31)
        ids = rng.integers(2, self.vocab - 1,
                           (len(texts), self.length)).astype(np.int64)
        ids[:, -1] = self.eos
        return {"input_ids": ids, "attention_mask": np.ones_like(ids)}


def _images(n, size=64):
    rng = np.random.default_rng(0)
    return [Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8)) for i in range(n)]


def test_preprocess_metric_image_shape_and_range():
    out = preprocess_metric_image(_images(1, 100)[0], image_size=28)
    assert out.shape == (3, 28, 28)
    assert np.isfinite(out).all()


def _tiny_cross_params(dim, heads=2, layers=2):
    rng = np.random.default_rng(1)

    def lin(o, i):
        return {"w": (rng.standard_normal((i, o)) / np.sqrt(i)
                      ).astype(np.float32)}
    inner = heads * 64
    return {"layers": [{
        "cross": {"norm": {"scale": np.ones(dim, np.float32)},
                  "to_q": lin(inner, dim), "to_kv": lin(128, dim),
                  "to_out": lin(dim, inner), "ff1": lin(8 * dim, dim),
                  "ff2": lin(dim, 4 * dim)},
        "self": {"norm": {"scale": np.ones(dim, np.float32)},
                 "fused": lin(inner + 128 + 8 * dim, dim),
                 "attn_out": lin(dim, inner), "ff_out": lin(dim, 4 * dim)},
    } for _ in range(layers)]}


def test_pickscore_and_hps_smoke():
    cfg = C.CLIP_DUAL_TINY
    params = C.init_clip_dual(jax.random.PRNGKey(0), cfg)
    tok = StubTokenizer(cfg.vocab_size, cfg.eos_token_id, cfg.max_len)
    imgs = _images(3)
    ps = PickScore(params, cfg, tok).score(imgs, "a cat")
    assert len(ps) == 3 and all(np.isfinite(s) for s in ps)
    sm = PickScore(params, cfg, tok).score(imgs, "a cat", softmax=True)
    assert abs(sum(sm) - 1.0) < 1e-5
    hs = HPScore(params, cfg, tok).score(imgs, "a cat")
    assert len(hs) == 3 and all(np.isfinite(s) for s in hs)


def test_mps_smoke():
    cfg = C.CLIP_DUAL_TINY
    params = C.init_clip_dual(jax.random.PRNGKey(1), cfg)
    tok = StubTokenizer(cfg.vocab_size, cfg.eos_token_id, cfg.max_len)
    m = MPScore(params, _tiny_cross_params(cfg.proj_dim, heads=2), cfg, tok,
                cross_heads=2)
    scores = m.score(_images(2), "a dog")
    assert len(scores) == 2 and all(np.isfinite(s) for s in scores)


def test_imagereward_smoke():
    import torch
    cfg = B.BLIP_REWARD_TINY
    from test_blip_reward_parity import (_tiny_hf_vit, _tiny_ref_bert,
                                         _vit_state_dict_from_hf, _bert_sd)
    try:
        bert = _tiny_ref_bert()
    except Exception:
        pytest.skip("reference med.py unavailable")
    sd = {**_vit_state_dict_from_hf(_tiny_hf_vit()), **_bert_sd(bert, {})}
    torch.manual_seed(0)
    for i, (a, b) in zip(("0", "2", "4", "6", "7"),
                         [(cfg.text_dim, 1024), (1024, 128), (128, 64),
                          (64, 16), (16, 1)]):
        sd[f"mlp.layers.{i}.weight"] = torch.randn(b, a) * 0.02
        sd[f"mlp.layers.{i}.bias"] = torch.zeros(b)
    params = B.convert_image_reward(sd, cfg)
    tok = StubTokenizer(cfg.vocab_size, cfg.vocab_size - 1, 7)
    scores = ImageRewardScore(params, cfg, tok).score(_images(2), "a bird")
    assert len(scores) == 2 and all(np.isfinite(s) for s in scores)


def test_registry_has_all_metrics():
    for name in ("aesthetic", "clip", "pickscore", "hps", "mps",
                 "imagereward"):
        assert callable(get_metric.__globals__["_METRICS"][name])
    with pytest.raises(ValueError):
        get_metric("nope")
