"""Prompt encoding for Wan pipelines.

Mirrors WanPrompter (/root/reference/diffsynth/prompters/wan_prompter.py:86-109):
HF umT5 tokenizer (local path), whitespace cleaning, 512-token padding, and
zeroing embeddings past each sequence length after the T5 forward.
"""
from __future__ import annotations

import html
import re
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..models.t5 import T5Config, UMT5_XXL, t5_encode


def basic_clean(text: str) -> str:
    try:
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class WanPrompter:
    """Tokenize + encode prompts with the umT5 text encoder pytree."""

    def __init__(self, tokenizer_path: Optional[str] = None, text_len: int = 512,
                 cfg: T5Config = UMT5_XXL):
        self.text_len = text_len
        self.cfg = cfg
        self.tokenizer = None
        self.text_encoder_params = None
        # refiner/extender hooks (base_prompter.py:38-70)
        from .prompt_extend import PromptRefinerChain
        self.refiners = PromptRefinerChain()
        if tokenizer_path is not None:
            self.fetch_tokenizer(tokenizer_path)

    def process_prompt(self, prompt: str, positive: bool = True) -> str:
        return self.refiners(prompt, positive=positive)

    def fetch_tokenizer(self, tokenizer_path: str):
        from transformers import AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)

    def fetch_tokenizer_near(self, checkpoint_paths) -> bool:
        """First-run tokenizer discovery: the reference vendors the umT5
        tokenizer assets in-package (diffsynth/tokenizer_configs/,
        setup.py:28); this build ships no third-party assets, so instead
        look for tokenizer sidecars next to the loaded checkpoints —
        <dir>/google/umt5-xxl/, <dir>/tokenizer/, or tokenizer files in the
        checkpoint directory itself. Returns True when found."""
        import os
        roots = []
        for p in checkpoint_paths or []:
            d = os.path.dirname(os.path.abspath(p))
            roots += [d, os.path.dirname(d)]
        seen = set()
        for root in roots:
            if root in seen or not os.path.isdir(root):
                continue
            seen.add(root)
            for sub in ("", "google/umt5-xxl", "umt5-xxl", "tokenizer"):
                cand = os.path.join(root, sub) if sub else root
                if any(os.path.isfile(os.path.join(cand, f))
                       for f in ("tokenizer.json", "spiece.model",
                                 "tokenizer_config.json")):
                    try:
                        self.fetch_tokenizer(cand)
                        return True
                    except Exception:
                        continue
        # no sidecar found: fall through to the HTTP transport (ModelScope
        # layout, HF fallback — utils/downloader.py), matching the
        # reference's out-of-box bootstrap (wan_video_new.py:402-405 fetches
        # google/umt5-xxl). Env-gated: VIDEO_STYLER_OFFLINE=1 skips network.
        if os.environ.get("VIDEO_STYLER_OFFLINE", "0") != "1":
            try:
                from ..utils.downloader import download_tokenizer
                self.fetch_tokenizer(download_tokenizer())
                return True
            except Exception:
                pass
        return False

    def fetch_models(self, text_encoder_params):
        self.text_encoder_params = text_encoder_params

    def tokenize(self, prompt: str):
        cleaned = whitespace_clean(basic_clean(prompt))
        enc = self.tokenizer([cleaned], padding="max_length", truncation=True,
                             max_length=self.text_len, return_tensors="np")
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)

    def encode_prompt(self, prompt: str, positive: bool = True, dtype=jnp.bfloat16):
        """-> (1, text_len, dim) embeddings, zeroed past the sequence length."""
        if self.tokenizer is None or self.text_encoder_params is None:
            raise RuntimeError("prompter needs fetch_tokenizer + fetch_models first")
        prompt = self.process_prompt(prompt, positive=positive)
        ids, mask = self.tokenize(prompt)
        emb = t5_encode(self.text_encoder_params, self.cfg,
                        jnp.asarray(ids), jnp.asarray(mask))
        seq_len = int(mask.sum())
        emb = emb * (jnp.arange(self.text_len) < seq_len)[None, :, None]
        return emb.astype(dtype)
