"""Image quality metrics for dataset filtering.

Port surface of /root/reference/diffsynth/extensions/ImageQualityMetric
(aesthetic, CLIP score, HPS, ImageReward, MPS, PickScore). The reference
vendors full BLIP/open_clip towers; here:

  - AestheticPredictor: the standard LAION aesthetic MLP head over CLIP
    image embeddings (checkpoint-loadable), with a pluggable feature
    extractor (defaults to our CLIP ViT tower when its weights are attached)
  - CLIPScore: cosine similarity scaffold over pluggable image/text
    embedding fns
  - metric registry mirroring the reference's `download_metric_model` names;
    all six metric towers are ported (PickScore/HPS via clip_dual.py,
    MPS multi-query cross model, ImageReward via blip_reward.py)

Offline-friendly: everything accepts precomputed embeddings.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp


class AestheticPredictor:
    """LAION aesthetic-v2 head: MLP(768->1024->128->64->16->1) over
    L2-normalized CLIP ViT-L/14 image embeddings."""

    LAYER_DIMS = [(768, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]

    def __init__(self, mlp_params: Dict, feature_fn: Optional[Callable] = None):
        self.params = mlp_params
        self.feature_fn = feature_fn

    @classmethod
    def from_state_dict(cls, sd, feature_fn=None):
        # torch keys: layers.{0,2,4,6,7}.weight/bias (Sequential with Dropouts)
        params = {}
        idxs = [i for i in ("0", "2", "4", "6", "7")
                if f"layers.{i}.weight" in sd]
        for j, i in enumerate(idxs):
            w = np.asarray(sd[f"layers.{i}.weight"], np.float32)
            b = np.asarray(sd[f"layers.{i}.bias"], np.float32)
            params[str(j)] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
        return cls(params, feature_fn)

    def score_embeddings(self, emb) -> np.ndarray:
        x = jnp.asarray(emb, jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        n = len(self.params)
        for i in range(n):
            p = self.params[str(i)]
            x = x @ p["w"] + p["b"]
            if i < n - 1 and x.shape[-1] >= 64:
                pass  # reference MLP uses plain Linear stacks + dropout (eval no-op)
        return np.asarray(x[..., 0])

    def score(self, images: List) -> List[float]:
        if self.feature_fn is None:
            raise RuntimeError("no CLIP feature_fn attached; pass embeddings "
                               "to score_embeddings instead")
        emb = self.feature_fn(images)
        return [float(s) for s in self.score_embeddings(emb)]


class CLIPScore:
    """cosine(image_emb, text_emb) * 100 over pluggable embedders."""

    def __init__(self, image_fn: Callable, text_fn: Callable):
        self.image_fn = image_fn
        self.text_fn = text_fn

    def score(self, images: List, prompt: str) -> List[float]:
        ie = np.asarray(self.image_fn(images), np.float32)
        te = np.asarray(self.text_fn([prompt]), np.float32)
        ie = ie / np.linalg.norm(ie, axis=-1, keepdims=True)
        te = te / np.linalg.norm(te, axis=-1, keepdims=True)
        return [float(s) for s in (ie @ te.T)[:, 0] * 100.0]


def preprocess_metric_image(image, image_size: int = 224) -> np.ndarray:
    """CLIP-style eval transform (reference imagereward.py:15-22 and the HF
    CLIPImageProcessor defaults): bicubic resize of the short side to
    `image_size`, center crop, CLIP mean/std normalize. -> (3, S, S)."""
    from PIL import Image
    from ..models.clip_vit import CLIP_MEAN, CLIP_STD
    if not isinstance(image, Image.Image):
        image = Image.fromarray(np.asarray(image))
    image = image.convert("RGB")
    w, h = image.size
    scale = image_size / min(w, h)
    image = image.resize((max(image_size, round(w * scale)),
                          max(image_size, round(h * scale))), Image.BICUBIC)
    w, h = image.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    image = image.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(image, np.float32).transpose(2, 0, 1) / 255.0
    mean = np.asarray(CLIP_MEAN, np.float32)[:, None, None]
    std = np.asarray(CLIP_STD, np.float32)[:, None, None]
    return (arr - mean) / std


def _as_pixel_batch(images, image_size: int) -> np.ndarray:
    if not isinstance(images, (list, tuple)):
        images = [images]
    return np.stack([preprocess_metric_image(im, image_size) for im in images])


class PickScore:
    """PickScore (reference pickscore.py:8-112): normalized CLIP text @ image
    similarity on the PickScore-finetuned ViT-H/14."""

    def __init__(self, params, cfg=None, tokenizer=None):
        from ..models import clip_dual as C
        self.C = C
        self.params = params
        self.cfg = cfg or C.CLIP_VIT_H_14_DUAL
        self.tokenizer = tokenizer

    @classmethod
    def from_state_dict(cls, sd, cfg=None, tokenizer=None):
        from ..models import clip_dual as C
        cfg = cfg or C.CLIP_VIT_H_14_DUAL
        return cls(C.convert_hf_clip(sd, cfg), cfg, tokenizer)

    def _tokenize(self, prompt: str):
        t = self.tokenizer([prompt], padding=True, truncation=True,
                           max_length=77, return_tensors="np")
        return t["input_ids"], t["attention_mask"]

    def score(self, images, prompt: str, softmax: bool = False) -> List[float]:
        C, cfg = self.C, self.cfg
        ids, mask = self._tokenize(prompt)
        te = np.asarray(C.clip_text_features(
            self.params, cfg, jnp.asarray(ids), jnp.asarray(mask)), np.float32)
        te = te / np.linalg.norm(te, axis=-1, keepdims=True)
        pix = _as_pixel_batch(images, cfg.image_size)
        ie = np.asarray(C.clip_image_features(self.params, cfg,
                                              jnp.asarray(pix)), np.float32)
        ie = ie / np.linalg.norm(ie, axis=-1, keepdims=True)
        scores = (te @ ie.T)[0]
        if softmax:
            # the reference scores one image per call, so its softmax is
            # degenerate (pickscore.py:50-53); softmax over the batch here
            e = np.exp(np.exp(self.params["logit_scale"]) * scores)
            scores = e / e.sum()
        return [float(s) for s in scores]


class HPScore:
    """HPS v2/v2.1 (reference hps.py:20-118): diagonal of normalized
    image @ text similarity on the HPS-tuned open_clip ViT-H-14."""

    def __init__(self, params, cfg=None, tokenizer=None):
        from ..models import clip_dual as C
        self.C = C
        self.params = params
        self.cfg = cfg or C.CLIP_VIT_H_14_DUAL
        self.tokenizer = tokenizer

    @classmethod
    def from_state_dict(cls, sd, cfg=None, tokenizer=None):
        from ..models import clip_dual as C
        cfg = cfg or C.CLIP_VIT_H_14_DUAL
        return cls(C.convert_open_clip(sd, cfg), cfg, tokenizer)

    def score(self, images, prompt: str) -> List[float]:
        C, cfg = self.C, self.cfg
        t = self.tokenizer([prompt], padding="max_length", truncation=True,
                           max_length=77, return_tensors="np")
        te = np.asarray(C.clip_text_features(self.params, cfg,
                                             jnp.asarray(t["input_ids"])),
                        np.float32)
        te = te / np.linalg.norm(te, axis=-1, keepdims=True)
        pix = _as_pixel_batch(images, cfg.image_size)
        ie = np.asarray(C.clip_image_features(self.params, cfg,
                                              jnp.asarray(pix)), np.float32)
        ie = ie / np.linalg.norm(ie, axis=-1, keepdims=True)
        return [float(s) for s in (ie @ te.T)[:, 0]]


MPS_CONDITIONS = {
    "overall": "light, color, clarity, tone, style, ambiance, artistry, "
               "shape, face, hair, hands, limbs, structure, instance, "
               "texture, quantity, attributes, position, number, location, "
               "word, things",
    "aesthetics": "light, color, clarity, tone, style, ambiance, artistry",
    "quality": "shape, face, hair, hands, limbs, structure, instance, texture",
    "semantic": "quantity, attributes, position, number, location",
}


class MPScore:
    """MPS (reference mps.py:27-96): token-level CLIP features + a 4-layer
    multi-query cross model; the text/condition similarity gates which text
    tokens the image may attend to."""

    def __init__(self, params, cross_params, cfg=None, tokenizer=None,
                 condition: str = "overall", cross_heads: int = 16):
        from ..models import clip_dual as C
        self.C = C
        self.params = params
        self.cross_params = cross_params
        self.cfg = cfg or C.CLIP_VIT_H_14_DUAL
        self.tokenizer = tokenizer
        self.condition = condition
        self.cross_heads = cross_heads

    @classmethod
    def from_state_dict(cls, sd, cfg=None, tokenizer=None,
                        condition: str = "overall"):
        from ..models import clip_dual as C
        cfg = cfg or C.CLIP_VIT_H_14_DUAL
        return cls(C.convert_hf_clip(sd, cfg), C.convert_cross_model(sd),
                   cfg, tokenizer, condition)

    def _text_tokens(self, prompt: str):
        t = self.tokenizer([prompt], padding="max_length", truncation=True,
                           max_length=77, return_tensors="np")
        ids = jnp.asarray(t["input_ids"])
        tokens, pooled = self.C.clip_text_forward(self.params, self.cfg, ids)
        proj = self.params["text_projection"]
        from ..ops.basic import linear as _linear
        return (np.asarray(_linear(proj, tokens), np.float32),
                np.asarray(_linear(proj, pooled), np.float32))

    def score(self, images, prompt: str) -> List[float]:
        C, cfg = self.C, self.cfg
        text_f, text_eos = self._text_tokens(prompt)
        cond_f, _ = self._text_tokens(MPS_CONDITIONS[self.condition])

        # mask: which text tokens are similar enough to the condition set
        sim = np.einsum("bid,bjd->bji", text_f, cond_f)
        sim = sim.max(axis=1, keepdims=True)
        sim = sim / sim.max()
        mask = np.where(sim > 0.3, 0.0, -np.inf).astype(np.float32)

        from ..ops.basic import linear as _linear
        scores = []
        for im in (images if isinstance(images, (list, tuple)) else [images]):
            pix = _as_pixel_batch([im], cfg.image_size)
            tokens, _ = C.clip_vision_forward(self.params, cfg,
                                              jnp.asarray(pix))
            image_f = _linear(self.params["visual_projection"], tokens)
            m = jnp.asarray(np.repeat(mask, image_f.shape[1], axis=1))
            fused = C.cross_model_forward(self.cross_params, image_f,
                                          jnp.asarray(text_f), m,
                                          heads=self.cross_heads)[:, 0, :]
            ie = np.asarray(fused, np.float32)
            ie = ie / np.linalg.norm(ie, axis=-1, keepdims=True)
            te = text_eos / np.linalg.norm(text_eos, axis=-1, keepdims=True)
            logit = np.exp(self.params["logit_scale"])
            scores.append(float((logit * te @ ie.T)[0, 0]))
        return scores


class ImageRewardScore:
    """ImageReward (reference imagereward.py:55-190): BLIP multimodal [CLS]
    state -> 5-layer MLP -> z-scored reward."""

    def __init__(self, params, cfg=None, tokenizer=None):
        from ..models import blip_reward as B
        self.B = B
        self.params = params
        self.cfg = cfg or B.IMAGE_REWARD
        self.tokenizer = tokenizer

    @classmethod
    def from_state_dict(cls, sd, cfg=None, tokenizer=None):
        from ..models import blip_reward as B
        cfg = cfg or B.IMAGE_REWARD
        return cls(B.convert_image_reward(sd, cfg), cfg, tokenizer)

    def score(self, images, prompt: str) -> List[float]:
        B, cfg = self.B, self.cfg
        t = self.tokenizer([prompt], padding="max_length", truncation=True,
                           max_length=35, return_tensors="np")
        pix = _as_pixel_batch(images, cfg.image_size)
        n = pix.shape[0]
        r = B.image_reward_forward(
            self.params, cfg, jnp.asarray(pix),
            jnp.asarray(np.repeat(t["input_ids"], n, axis=0)),
            jnp.asarray(np.repeat(t["attention_mask"], n, axis=0)))
        return [float(s) for s in np.asarray(r, np.float32)]


_METRICS = {"aesthetic": AestheticPredictor, "clip": CLIPScore,
            "pickscore": PickScore, "hps": HPScore, "mps": MPScore,
            "imagereward": ImageRewardScore}


def get_metric(name: str, **kwargs):
    name = name.lower()
    if name in _METRICS:
        return _METRICS[name](**kwargs)
    raise ValueError(f"unknown metric {name}")
