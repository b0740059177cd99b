"""NexusGen: Qwen2.5-VL embedding adapters for FLUX conditioning, TPU-native.

Re-design of the reference NexusGen stack:
  * NexusGenAdapter (generation): 2-layer MLP 3584 -> 4096
    (/root/reference/diffsynth/models/nexus_gen_projector.py:389-405)
  * NexusGenImageEmbeddingMerger (editing): one bidirectional Qwen2.5-VL
    decoder layer with multimodal RoPE over (target, reference) embedding
    grids, then an RMS/SiLU projector to 4096
    (nexus_gen_projector.py:255-376)
  * NexusGenARModel: the 7B Qwen2.5-VL autoregressive embedding predictor
    (nexus_gen.py:5-152, nexus_gen_ar_model.py) — a one-shot host-side
    preprocessing step, served through transformers' Qwen2.5-VL with the
    custom vision_head / image_prefill_embeds splicing replicated here.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm, silu, init_linear, init_layer_norm
from ..ops.attention import sdpa


# -- generation adapter --------------------------------------------------------

def nexus_gen_adapter_forward(params, x):
    """Linear -> LayerNorm -> ReLU -> Linear -> LayerNorm (projector:393-397)."""
    h = layer_norm(params["ln1"], linear(params["fc1"], x), eps=1e-5)
    h = jnp.maximum(h, 0.0)
    return layer_norm(params["ln2"], linear(params["fc2"], h), eps=1e-5)


def convert_nexus_gen_adapter(sd, dtype=jnp.bfloat16):
    def _np(v):
        return np.asarray(v.detach().float().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def lin(k):
        return {"w": jnp.asarray(_np(sd[f"{k}.weight"]).T, dtype),
                "b": jnp.asarray(_np(sd[f"{k}.bias"]), dtype)}

    def ln(k):
        return {"scale": jnp.asarray(_np(sd[f"{k}.weight"]), dtype),
                "bias": jnp.asarray(_np(sd[f"{k}.bias"]), dtype)}

    return {"fc1": lin("adapter.0"), "ln1": ln("adapter.1"),
            "fc2": lin("adapter.3"), "ln2": ln("adapter.4")}


def init_nexus_gen_adapter(key, in_dim=3584, out_dim=4096, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, in_dim, out_dim, dtype=dtype),
            "ln1": init_layer_norm(out_dim, dtype=dtype),
            "fc2": init_linear(k2, out_dim, out_dim, dtype=dtype),
            "ln2": init_layer_norm(out_dim, dtype=dtype)}


# -- editing merger ------------------------------------------------------------

@dataclass(frozen=True)
class NexusGenMergerConfig:
    hidden_size: int = 3584
    num_heads: int = 28
    num_kv_heads: int = 4
    intermediate_size: int = 18944
    num_layers: int = 1
    out_channel: int = 4096
    expand_ratio: int = 4
    rms_eps: float = 1e-6
    rope_theta: float = 1e6
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    spatial_merge_size: int = 2
    tokens_per_second: int = 2
    base_grid: Tuple[int, int, int] = (1, 72, 72)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


NEXUS_GEN_MERGER = NexusGenMergerConfig()
NEXUS_GEN_MERGER_TINY = NexusGenMergerConfig(
    hidden_size=32, num_heads=2, num_kv_heads=1, intermediate_size=48,
    out_channel=24, mrope_section=(4, 2, 2), base_grid=(1, 8, 8))


def merger_position_ids(cfg: NexusGenMergerConfig,
                        grid_thw: np.ndarray) -> np.ndarray:
    """(3, 1, L) mrope position ids, scaled to the 72x72 base grid
    (projector:329-356)."""
    t, h, w = int(grid_thw[0][0]), int(grid_thw[0][1]), int(grid_thw[0][2])
    gh, gw = h // cfg.spatial_merge_size, w // cfg.spatial_merge_size
    scale_h = cfg.base_grid[1] / h
    scale_w = cfg.base_grid[2] / w
    t_idx = np.repeat(np.arange(t) * cfg.tokens_per_second, gh * gw)
    h_idx = np.tile(np.repeat(np.arange(gh), gw), t) * scale_h
    w_idx = np.tile(np.tile(np.arange(gw), gh), t) * scale_w
    return np.stack([t_idx, h_idx, w_idx]).astype(np.float64)[:, None]


def mrope_tables(cfg: NexusGenMergerConfig, position_ids: np.ndarray):
    """(3, B, L) positions -> combined (B, L, head_dim) cos/sin: per-section
    t/h/w interleave (apply_multimodal_rotary_pos_emb, projector:15-26)."""
    d = cfg.head_dim
    inv = 1.0 / cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    freqs = position_ids[..., None] * inv          # (3, B, L, d/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (3, B, L, d)
    cos3, sin3 = np.cos(emb), np.sin(emb)
    sections = list(cfg.mrope_section) * 2
    out_cos, out_sin = [], []
    start = 0
    for i, sec in enumerate(sections):
        out_cos.append(cos3[i % 3, ..., start:start + sec])
        out_sin.append(sin3[i % 3, ..., start:start + sec])
        start += sec
    return (np.concatenate(out_cos, axis=-1).astype(np.float32),
            np.concatenate(out_sin, axis=-1).astype(np.float32))


def _rms(p, x, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (p["scale"].astype(jnp.float32) * y).astype(x.dtype)


def _rot_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def _qwen_layer(p, x, cos, sin, cfg: NexusGenMergerConfig):
    b, s, d = x.shape
    n, g, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = _rms(p["ln1"], x, cfg.rms_eps)
    q = linear(p["q"], h).reshape(b, s, n, hd)
    k = linear(p["k"], h).reshape(b, s, g, hd)
    v = linear(p["v"], h).reshape(b, s, g, hd)
    c, sn = cos[:, :, None], sin[:, :, None]
    q = (q.astype(jnp.float32) * c + _rot_half(q.astype(jnp.float32)) * sn
         ).astype(x.dtype)
    k = (k.astype(jnp.float32) * c + _rot_half(k.astype(jnp.float32)) * sn
         ).astype(x.dtype)
    k = jnp.repeat(k, n // g, axis=2)
    v = jnp.repeat(v, n // g, axis=2)
    a = sdpa(q, k, v).reshape(b, s, d)       # bidirectional, no mask
    x = x + linear(p["o"], a)
    h = _rms(p["ln2"], x, cfg.rms_eps)
    return x + linear(p["down"], silu(linear(p["gate"], h))
                      * linear(p["up"], h))


def nexus_gen_merger_forward(params, cfg: NexusGenMergerConfig, embeds,
                             embeds_grid, ref_embeds=None,
                             ref_embeds_grid=None):
    """NexusGenImageEmbeddingMerger.forward (projector:357-376)."""
    pos = merger_position_ids(cfg, np.asarray(embeds_grid))
    x = embeds
    if ref_embeds is not None:
        pos_ref = merger_position_ids(cfg, np.asarray(ref_embeds_grid))
        pos = np.concatenate([pos, pos_ref], axis=-1)
        x = jnp.concatenate([embeds, ref_embeds], axis=1)
    cos, sin = mrope_tables(cfg, pos)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    for layer in params["layers"]:
        x = _qwen_layer(layer, x, cos, sin, cfg)
    p = params["projector"]
    x = _rms(p["norm1"], x, cfg.rms_eps)
    x = linear(p["fc1"], x)
    x = _rms(p["norm2"], x, cfg.rms_eps)
    x = linear(p["fc2"], silu(x))
    return _rms(p["norm3"], x, cfg.rms_eps)


def convert_nexus_gen_merger(sd, cfg: NexusGenMergerConfig = NEXUS_GEN_MERGER,
                             dtype=jnp.bfloat16):
    def _np(v):
        return np.asarray(v.detach().float().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def lin(k):
        p = {"w": jnp.asarray(_np(sd[f"{k}.weight"]).T, dtype)}
        if f"{k}.bias" in sd:
            p["b"] = jnp.asarray(_np(sd[f"{k}.bias"]), dtype)
        return p

    def rms(k):
        return {"scale": jnp.asarray(_np(sd[f"{k}.weight"]), dtype)}

    layers = []
    for i in range(cfg.num_layers):
        p = f"layers.{i}"
        layers.append({
            "ln1": rms(f"{p}.input_layernorm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.o_proj"),
            "ln2": rms(f"{p}.post_attention_layernorm"),
            "gate": lin(f"{p}.mlp.gate_proj"),
            "up": lin(f"{p}.mlp.up_proj"),
            "down": lin(f"{p}.mlp.down_proj"),
        })
    return {"layers": layers,
            "projector": {"norm1": rms("projector.0"),
                          "fc1": lin("projector.1"),
                          "norm2": rms("projector.2"),
                          "fc2": lin("projector.4"),
                          "norm3": rms("projector.5")}}


def init_nexus_gen_merger(key, cfg: NexusGenMergerConfig = NEXUS_GEN_MERGER_TINY,
                          dtype=jnp.float32):
    d, hd = cfg.hidden_size, cfg.head_dim
    ks = iter(jax.random.split(key, 8 * cfg.num_layers + 4))
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1": {"scale": jnp.ones((d,), dtype)},
            "q": init_linear(next(ks), d, cfg.num_heads * hd, dtype=dtype),
            "k": init_linear(next(ks), d, cfg.num_kv_heads * hd, dtype=dtype),
            "v": init_linear(next(ks), d, cfg.num_kv_heads * hd, dtype=dtype),
            "o": init_linear(next(ks), cfg.num_heads * hd, d, bias=False,
                             dtype=dtype),
            "ln2": {"scale": jnp.ones((d,), dtype)},
            "gate": init_linear(next(ks), d, cfg.intermediate_size,
                                bias=False, dtype=dtype),
            "up": init_linear(next(ks), d, cfg.intermediate_size, bias=False,
                              dtype=dtype),
            "down": init_linear(next(ks), cfg.intermediate_size, d,
                                bias=False, dtype=dtype),
        })
    oc, ex = cfg.out_channel, cfg.expand_ratio
    return {"layers": layers,
            "projector": {"norm1": {"scale": jnp.ones((d,), dtype)},
                          "fc1": init_linear(next(ks), d, oc * ex, dtype=dtype),
                          "norm2": {"scale": jnp.ones((oc * ex,), dtype)},
                          "fc2": init_linear(next(ks), oc * ex, oc, dtype=dtype),
                          "norm3": {"scale": jnp.ones((oc,), dtype)}}}


# -- autoregressive embedding predictor (host-side preprocessing) --------------

class NexusGenARModel:
    """Host-side wrapper over transformers' Qwen2.5-VL with NexusGen's custom
    pieces (nexus_gen.py:101-152): image_prefill_embeds splicing for target
    tokens and a vision_head projecting hidden states to embeddings."""

    GEN_MSG = ("You are a helpful assistant capable of generating images. "
               "Generate an image according to the user's instruction.")

    def __init__(self, model, processor, vision_head_w, vision_head_b,
                 prefill_embeds):
        self.model = model
        self.processor = processor
        self.vision_head_w = vision_head_w      # (D_hidden, D_out) numpy
        self.vision_head_b = vision_head_b
        self.prefill_embeds = prefill_embeds    # (81, D_hidden) numpy

    @classmethod
    def from_pretrained(cls, path: str, state_dict=None):
        import torch
        from transformers import (Qwen2_5_VLForConditionalGeneration,
                                  AutoProcessor)
        model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
            path, torch_dtype=torch.float32)
        processor = AutoProcessor.from_pretrained(path)
        sd = state_dict or {}
        vh_w = np.asarray(sd.get("vision_head.weight"), np.float32).T \
            if "vision_head.weight" in sd else None
        vh_b = (np.asarray(sd["vision_head.bias"], np.float32)
                if "vision_head.bias" in sd else None)
        pf = (np.asarray(sd["image_prefill_embeds.weight"], np.float32)
              if "image_prefill_embeds.weight" in sd else None)
        return cls(model, processor, vh_w, vh_b, pf)

    def __call__(self, instruction: str, ref_image=None,
                 num_img_tokens: int = 81):
        import torch
        from PIL import Image
        if ref_image is not None:
            messages = [
                {"role": "system", "content": self.GEN_MSG},
                {"role": "user", "content": f"<image> {instruction}"},
                {"role": "assistant", "content": "<image>"},
            ]
            images = [ref_image,
                      Image.new("RGB", (252, 252), (255, 255, 255))]
        else:
            messages = [
                {"role": "system", "content": self.GEN_MSG},
                {"role": "user", "content": instruction},
                {"role": "assistant", "content": "<image>"},
            ]
            images = [Image.new("RGB", (252, 252), (255, 255, 255))]
        text = self.processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=False)
        text = text.replace(
            "<image>", "<|vision_start|><|image_pad|><|vision_end|>")
        inputs = self.processor(text=[text], images=images, padding=True,
                                return_tensors="pt")
        model = self.model
        with torch.no_grad():
            input_embeds = model.model.embed_tokens(inputs["input_ids"])
            image_embeds = model.visual(inputs["pixel_values"],
                                        grid_thw=inputs["image_grid_thw"])
            gt = image_embeds[-num_img_tokens:]
            input_image_embeds = image_embeds[:-num_img_tokens]
            image_mask = inputs["input_ids"] == model.config.image_token_id
            indices = image_mask.cumsum(dim=1)
            in_mask = torch.logical_and(
                indices <= (image_embeds.shape[0] - gt.shape[0]), image_mask)
            gt_mask = torch.logical_and(image_mask, ~in_mask)
            input_embeds = input_embeds.masked_scatter(
                in_mask.unsqueeze(-1).expand_as(input_embeds),
                input_image_embeds)
            prefill = torch.from_numpy(self.prefill_embeds)
            input_embeds = input_embeds.masked_scatter(
                gt_mask.unsqueeze(-1).expand_as(input_embeds), prefill)
            position_ids, _ = model.model.get_rope_index(
                inputs["input_ids"], inputs["image_grid_thw"],
                attention_mask=inputs["attention_mask"])
            out = model.model(inputs_embeds=input_embeds,
                              position_ids=position_ids.contiguous(),
                              attention_mask=inputs["attention_mask"])
            hidden = out.last_hidden_state.float().numpy()
        emb = hidden @ self.vision_head_w + self.vision_head_b
        emb = emb[:, :-1, :][np.asarray(gt_mask[:, 1:])]
        if ref_image is not None:
            return (emb, np.asarray(input_image_embeds),
                    np.asarray(inputs["image_grid_thw"]))
        return emb, None, np.asarray(inputs["image_grid_thw"])
