"""Native Qwen2.5-VL multimodal embedder (text + vision), TPU-native.

Replaces the reference's torch Qwen25VL_7b_Embedder
(/root/reference/diffsynth/models/qwenvl.py:1-168) used by the FLUX Step1x
edit pipeline, and provides the shared text+image encode used by
Qwen-Image-Edit (/root/reference/diffsynth/pipelines/qwen_image.py:552-575).

The language side runs models/llm_decoder.py under multimodal RoPE; the
vision side runs models/qwen_vl_vision.py; both are jitted JAX — torch /
`transformers` models are no longer on the inference path (the tokenizer
remains the user-supplied sentencepiece/BPE asset, as everywhere else in
this framework)."""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .llm_decoder import (DecoderLMConfig, decoder_lm_forward,
                          convert_decoder_lm, detect_decoder_lm_config)
from .qwen_vl_vision import (QwenVLVisionConfig, convert_qwen_vl_vision,
                             detect_vision_config, preprocess_image,
                             vision_plan, vision_forward, get_rope_index,
                             IMAGE_TOKEN_ID, VIDEO_TOKEN_ID)

MROPE_SECTION = (16, 24, 24)  # Qwen2.5-VL-7B (qwen_image_text_encoder.py:30)

# The Qwen2.5-VL chat template rendered for one user turn with
# add_generation_prompt=True and the default system prompt (the exact string
# processor.apply_chat_template produces; hardcoded so no chat-template
# asset is required).
CHAT_PREFIX = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
               "<|im_start|>user\n")
CHAT_SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"
IMG_BLOCK = "<|vision_start|><|image_pad|><|vision_end|>"

# Step1x prompt-enhancement prefix (qwenvl.py:23-30)
STEP1X_PREFIX = '''Given a user prompt, generate an "Enhanced prompt" that provides detailed visual descriptions suitable for image generation. Evaluate the level of detail in the user prompt:
- If the prompt is simple, focus on adding specifics about colors, shapes, sizes, textures, and spatial relationships to create vivid and concrete scenes.
- If the prompt is already detailed, refine and enhance the existing details slightly without overcomplicating.\n
Here are examples of how to transform or refine prompts:
- User Prompt: A cat sleeping -> Enhanced: A small, fluffy white cat curled up in a round shape, sleeping peacefully on a warm sunny windowsill, surrounded by pots of blooming red flowers.
- User Prompt: A busy city street -> Enhanced: A bustling city street scene at dusk, featuring glowing street lamps, a diverse crowd of people in colorful clothing, and a double-decker bus passing by towering glass skyscrapers.\n
Please generate only the enhanced description for the prompt below and avoid including any additional commentary or evaluations:
User Prompt:'''


class QwenVL:
    """Text(+image) -> last-layer hidden states, all-JAX.

    Loads both towers from one Qwen2.5-VL checkpoint (the `visual.` /
    `model.` split of the HF layout)."""

    def __init__(self, state_dict, tokenizer, dtype=jnp.bfloat16,
                 text_cfg=None, vision_cfg=None, mrope_section=None,
                 image_token_id=IMAGE_TOKEN_ID,
                 video_token_id=VIDEO_TOKEN_ID,
                 vision_end_token_id=151653,
                 min_pixels=56 * 56, max_pixels=28 * 28 * 1280):
        # pixel budget defaults = the HF Qwen2VLImageProcessor class
        # defaults (the reference's pipe.processor)
        self.min_pixels, self.max_pixels = min_pixels, max_pixels
        text_sd = {k: v for k, v in state_dict.items() if "visual" not in k}
        self.text_cfg = text_cfg or detect_decoder_lm_config(text_sd,
                                                             family="qwen")
        self.text_params = convert_decoder_lm(text_sd, self.text_cfg,
                                              dtype=dtype)
        has_visual = any(k.startswith(("visual.", "model.visual."))
                         for k in state_dict)
        self.vision_cfg = vision_cfg if has_visual else None
        self.vision_params = None
        if has_visual:
            vsd = {k[len("model."):] if k.startswith("model.visual.") else k: v
                   for k, v in state_dict.items() if "visual" in k}
            if self.vision_cfg is None:
                self.vision_cfg = detect_vision_config(vsd)
            self.vision_params = convert_qwen_vl_vision(
                vsd, self.vision_cfg, dtype=dtype)
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_end_token_id = vision_end_token_id
        self.mrope_section = tuple(mrope_section or MROPE_SECTION)
        self._fwd = jax.jit(
            lambda p, ids, mask, emb, pos: decoder_lm_forward(
                p, self.text_cfg, ids, mask, inputs_embeds=emb,
                position_ids=pos, mrope_section=self.mrope_section),
            static_argnames=())

    # ------------------------------------------------------------- helpers

    def _expand_image_pads(self, text: str, grids) -> str:
        """HF processor semantics: each <|image_pad|> expands to the
        image's merged-token count."""
        out = []
        rest = text
        for (t, h, w) in grids:
            n = t * h * w // (self.vision_cfg.merge ** 2)
            head, _, rest = rest.partition("<|image_pad|>")
            out.append(head + "<|image_pad|>" * n)
        return "".join(out) + rest

    def embed_images(self, images: Sequence, min_pixels=None,
                     max_pixels=None):
        """-> (vision embeds (sum n_i, hidden), grids list)."""
        pats, grids = [], []
        for im in images:
            p, g = preprocess_image(im, self.vision_cfg,
                                    min_pixels or self.min_pixels,
                                    max_pixels or self.max_pixels)
            pats.append(p)
            grids.append(g)
        plan = vision_plan(grids, self.vision_cfg)
        emb = vision_forward(self.vision_params, self.vision_cfg,
                             jnp.asarray(np.concatenate(pats, 0), self.dtype),
                             plan)
        return emb, grids

    def encode_ids(self, ids: np.ndarray, img_emb=None, grids=()):
        """ids: (L,) with image-pad runs already expanded to the grids'
        merged-token counts. -> hidden (1, L, hidden) f32 numpy.

        Pads to a multiple of 32 under the attention mask so jit shapes
        bucket (pad rows are key-masked and sliced off)."""
        ids = np.asarray(ids, np.int32)
        L = len(ids)
        pos = get_rope_index(
            ids, list(grids), merge=(self.vision_cfg.merge if grids else 2),
            tokens_per_second=(self.vision_cfg.tokens_per_second
                               if grids else 2),
            image_token_id=self.image_token_id,
            video_token_id=self.video_token_id)
        pad = (-L) % 32
        ids_p = np.pad(ids, (0, pad))
        mask = np.pad(np.ones(L, np.int32), (0, pad))
        pos = np.pad(pos, ((0, 0), (0, pad)), mode="edge")
        embeds = jnp.take(self.text_params["embed"], jnp.asarray(ids_p)[None],
                          axis=0)
        if img_emb is not None:
            positions = np.where(ids == self.image_token_id)[0]
            embeds = embeds.at[0, positions].set(img_emb.astype(embeds.dtype))
        hidden = self._fwd(self.text_params, jnp.asarray(ids_p)[None],
                           jnp.asarray(mask)[None], embeds, jnp.asarray(pos))
        return np.asarray(hidden[:, :L], np.float32)

    def encode(self, text: str, images: Optional[Sequence] = None,
               min_pixels=None, max_pixels=None):
        """-> (hidden (1, L, hidden) f32 numpy, input_ids (L,) numpy).

        text must already contain one <|vision_start|><|image_pad|>
        <|vision_end|> block per image."""
        grids, img_emb = [], None
        if images:
            img_emb, grids = self.embed_images(images, min_pixels, max_pixels)
            text = self._expand_image_pads(text, grids)
        ids = np.asarray(self.tokenizer(text, return_tensors="np")
                         ["input_ids"][0], np.int32)
        return self.encode_ids(ids, img_emb, grids), ids


def _split_string(s: str):
    """qwenvl.py:64-90 verbatim semantics: after char 155, double-quoted
    spans are exploded into per-char quoted pieces (the Step1x trick that
    forces character-level tokenization of quoted text)."""
    s = s.replace("“", '"').replace("”", '"').replace("'", '"')
    result, in_quotes, temp = [], False, ""
    for idx, char in enumerate(s):
        if char == '"' and idx > 155:
            temp += char
            if not in_quotes:
                result.append(temp)
                temp = ""
            in_quotes = not in_quotes
            continue
        if in_quotes:
            result.append("“" + char + "”")
        else:
            temp += char
    if temp:
        result.append(temp)
    return result


class QwenVLStep1xEmbedder:
    """callable(captions, ref_images) -> (embs (B, 640, H), masks (B, 640)).

    The FLUX Step1x conditioning embedder (qwenvl.py Qwen25VL_7b_Embedder):
    chat-templated prefix + image + caption, the quote re-tokenization
    splice, then hidden[0, 217:][:640]."""

    def __init__(self, vl: QwenVL, max_length: int = 640):
        self.vl = vl
        self.max_length = max_length

    def __call__(self, captions: List[str], ref_images: List):
        H = self.vl.text_cfg.hidden
        embs = np.zeros((len(captions), self.max_length, H), np.float32)
        masks = np.zeros((len(captions), self.max_length), np.int64)
        tok = self.vl.tokenizer
        for i, (txt, img) in enumerate(zip(captions, ref_images)):
            # apply_chat_template(..., add_vision_id=True) rendering
            text = (CHAT_PREFIX + STEP1X_PREFIX + "Picture 1: " + IMG_BLOCK
                    + txt + CHAT_SUFFIX)
            img_emb, grids = self.vl.embed_images(
                [img], min_pixels=256 * 28 * 28, max_pixels=324 * 28 * 28)
            # processor-tokenized ids with the pads expanded (old_inputs_ids)
            old_ids = tok(self.vl._expand_image_pads(text, grids),
                          return_tensors="np")["input_ids"][0]
            # the reference re-tokenizes the raw text with quoted chars
            # exploded (qwenvl.py:117-138) ...
            toks = []
            for piece in _split_string(text):
                t = tok(piece, return_tensors="np")["input_ids"][0]
                # strip the “ ” wrapper tokens (ids 2073/854, qwenvl.py:130)
                if len(t) >= 2 and t[0] == 2073 and t[-1] == 854:
                    t = t[1:-1]
                toks.append(t)
            new_ids = np.concatenate(toks)
            # ... and splices everything from <|vision_end|> (151653) of the
            # re-tokenization onto the expanded prefix (qwenvl.py:140-146)
            ve = self.vl.vision_end_token_id
            ve_old = int(np.where(old_ids == ve)[0][0])
            ve_new = int(np.where(new_ids == ve)[0][0])
            ids = np.concatenate([old_ids[:ve_old], new_ids[ve_new:]])
            hidden = self.vl.encode_ids(ids, img_emb, grids)
            emb = hidden[0, 217:][: self.max_length]
            embs[i, : emb.shape[0]] = emb
            masks[i, : emb.shape[0]] = 1
        return embs, masks
