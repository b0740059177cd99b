"""Prompt refiners / extenders.

Port surface of the reference hooks (prompters/base_prompter.py:38-70) and
the enhancer's prompt expanders (denoising_enhancing/wan/utils/
prompt_extend.py): a prompt passes through optional refiner chains before
encoding. Network expanders (DashScope / Qwen-VL) are HTTP clients requiring
egress; the template expander works offline.
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional


class TemplatePromptExpander:
    """Offline expander: appends quality/style boilerplate like the Wan
    system prompts do."""

    POSITIVE_SUFFIX = (", cinematic lighting, highly detailed, smooth motion, "
                       "best quality, 4k")

    def __call__(self, prompt: str, positive: bool = True) -> str:
        if not positive or not prompt:
            return prompt
        if any(tok in prompt.lower() for tok in ("quality", "detailed", "4k")):
            return prompt
        return prompt + self.POSITIVE_SUFFIX


class DashScopePromptExpander:
    """Qwen prompt expander over DashScope HTTP (needs DASHSCOPE_API_KEY +
    network egress)."""

    def __init__(self, model: str = "qwen-plus", max_retries: int = 3):
        self.model = model
        self.max_retries = max_retries

    def __call__(self, prompt: str, positive: bool = True) -> str:
        import json
        import urllib.request
        api_key = os.environ.get("DASHSCOPE_API_KEY")
        if not api_key:
            raise RuntimeError("DASHSCOPE_API_KEY not configured")
        payload = json.dumps({
            "model": self.model,
            "input": {"messages": [
                {"role": "system",
                 "content": "Expand the following video generation prompt "
                            "with rich visual detail. Reply with the prompt only."},
                {"role": "user", "content": prompt}]},
        }).encode()
        req = urllib.request.Request(
            "https://dashscope.aliyuncs.com/api/v1/services/aigc/text-generation/generation",
            data=payload,
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {api_key}"})
        from ..agent.image_generation import retry_with_backoff
        def call():
            with urllib.request.urlopen(req, timeout=60) as resp:
                data = json.loads(resp.read())
            return data["output"]["text"]
        return retry_with_backoff(call, max_retries=self.max_retries)


class PromptRefinerChain:
    """BasePrompter.process_prompt semantics: run refiners in order."""

    def __init__(self, refiners: Optional[List[Callable]] = None):
        self.refiners = refiners or []

    def add(self, refiner: Callable):
        self.refiners.append(refiner)
        return self

    def __call__(self, prompt: str, positive: bool = True) -> str:
        for r in self.refiners:
            prompt = r(prompt, positive=positive)
        return prompt
