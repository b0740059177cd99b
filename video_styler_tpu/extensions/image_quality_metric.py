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
    metrics whose towers aren't ported yet raise a clear NotImplementedError

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


_METRICS = {"aesthetic": AestheticPredictor, "clip": CLIPScore}
_UNPORTED = ("hps", "imagereward", "mps", "pickscore")


def get_metric(name: str, **kwargs):
    name = name.lower()
    if name in _METRICS:
        return _METRICS[name](**kwargs)
    if name in _UNPORTED:
        raise NotImplementedError(
            f"metric '{name}' requires its vendored scoring tower; "
            f"ported metrics: {', '.join(_METRICS)}")
    raise ValueError(f"unknown metric {name}")
