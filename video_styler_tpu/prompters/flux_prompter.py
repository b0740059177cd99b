"""FLUX prompter: CLIP-L pooled embedding + T5 sequence embedding.

Re-design of /root/reference/diffsynth/prompters/flux_prompter.py:8-90.
Tokenizers are external (pass paths to HF CLIPTokenizer / T5TokenizerFast
assets); encoders are our JAX modules.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


class FluxPrompter:
    def __init__(self):
        self.tokenizer_1 = None     # CLIP tokenizer (max_length 77)
        self.tokenizer_2 = None     # T5 tokenizer
        self.clip_params = None
        self.t5_params = None
        self.t5_cfg = None

    def fetch_tokenizers(self, tokenizer_1_path: Optional[str] = None,
                         tokenizer_2_path: Optional[str] = None):
        from transformers import CLIPTokenizer, T5TokenizerFast
        if tokenizer_1_path:
            self.tokenizer_1 = CLIPTokenizer.from_pretrained(tokenizer_1_path)
        if tokenizer_2_path:
            self.tokenizer_2 = T5TokenizerFast.from_pretrained(tokenizer_2_path)

    def fetch_models(self, clip_params=None, t5_params=None, t5_cfg=None):
        self.clip_params = clip_params
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg

    def _ids(self, tokenizer, prompt: str, max_length: int) -> np.ndarray:
        out = tokenizer([prompt], padding="max_length", max_length=max_length,
                        truncation=True, return_tensors="np")
        return np.asarray(out["input_ids"], np.int32)

    def encode_prompt(self, prompt: str, t5_sequence_length: int = 512,
                      dtype=jnp.bfloat16):
        """-> (prompt_emb (1, L, 4096), pooled (1, 768), text_ids (L, 3))
        (flux_prompter.py:56-90)."""
        from ..models.sd3_text_encoder import sd3_text_encoder_1_forward
        from ..models.t5 import t5_encode
        ids1 = self._ids(self.tokenizer_1, prompt, 77)
        pooled, _ = sd3_text_encoder_1_forward(self.clip_params,
                                               jnp.asarray(ids1))
        ids2 = self._ids(self.tokenizer_2, prompt, t5_sequence_length)
        prompt_emb = t5_encode(self.t5_params, self.t5_cfg, jnp.asarray(ids2))
        text_ids = np.zeros((ids2.shape[1], 3), np.float64)
        return (prompt_emb.astype(dtype), pooled.astype(dtype), text_ids)
