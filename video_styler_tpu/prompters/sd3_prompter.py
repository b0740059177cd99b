"""SD3 prompter: CLIP-L + OpenCLIP-bigG (+ optional T5-XXL) joint embedding.

Re-design of /root/reference/diffsynth/prompters/sd3_prompter.py:39-93:
prompt_emb = concat_seq( pad(concat_feat(clip1, clip2), 4096), t5 ),
pooled = concat_feat(pooled1, pooled2).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


class SD3Prompter:
    def __init__(self):
        self.tokenizer_1 = None
        self.tokenizer_2 = None
        self.tokenizer_3 = None
        self.te1_params = None          # SD3TextEncoder1 (CLIP-L)
        self.te2_params = None          # SDXLTextEncoder2 (bigG)
        self.t5_params = None           # T5-XXL v1.1 (optional)
        self.t5_cfg = None

    def fetch_tokenizers(self, path_1=None, path_2=None, path_3=None):
        from transformers import CLIPTokenizer, T5TokenizerFast
        if path_1:
            self.tokenizer_1 = CLIPTokenizer.from_pretrained(path_1)
        if path_2:
            self.tokenizer_2 = CLIPTokenizer.from_pretrained(path_2)
        if path_3:
            self.tokenizer_3 = T5TokenizerFast.from_pretrained(path_3)

    def fetch_models(self, te1_params=None, te2_params=None, t5_params=None,
                     t5_cfg=None):
        self.te1_params = te1_params
        self.te2_params = te2_params
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg

    def _ids(self, tokenizer, prompt, max_length):
        out = tokenizer([prompt], padding="max_length", max_length=max_length,
                        truncation=True, return_tensors="np")
        return np.asarray(out["input_ids"], np.int32)

    def encode_prompt(self, prompt: str, t5_sequence_length: int = 77,
                      dtype=jnp.bfloat16):
        from ..models.sd3_text_encoder import sd3_text_encoder_1_forward
        from ..models.sdxl import sdxl_text_encoder_2_forward
        ids1 = self._ids(self.tokenizer_1, prompt, 77)
        pooled_1, emb_1 = sd3_text_encoder_1_forward(self.te1_params,
                                                     jnp.asarray(ids1))
        ids2 = self._ids(self.tokenizer_2, prompt, 77)
        pooled_2, emb_2 = sdxl_text_encoder_2_forward(self.te2_params,
                                                      jnp.asarray(ids2))
        clip = jnp.concatenate([emb_1, emb_2], axis=-1)
        clip = jnp.pad(clip, ((0, 0), (0, 0), (0, 4096 - clip.shape[-1])))
        if self.t5_params is None:
            t5 = jnp.zeros((clip.shape[0], t5_sequence_length, 4096), clip.dtype)
        else:
            from ..models.t5 import t5_encode
            ids3 = self._ids(self.tokenizer_3, prompt, t5_sequence_length)
            t5 = t5_encode(self.t5_params, self.t5_cfg, jnp.asarray(ids3))
        prompt_emb = jnp.concatenate([clip, t5.astype(clip.dtype)], axis=-2)
        pooled = jnp.concatenate([pooled_1, pooled_2], axis=-1)
        return prompt_emb.astype(dtype), pooled.astype(dtype)
