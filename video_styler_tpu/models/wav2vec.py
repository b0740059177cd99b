"""Wav2Vec2 audio tower for S2V, TPU-native.

Re-design of the reference WanS2VAudioEncoder
(/root/reference/diffsynth/models/wav2vec.py:46-186): the wav2vec2-large
xlsr-53 CTC tower (7-layer conv feature extractor, feature projection,
24-layer stable-layer-norm transformer encoder) as pure functions over a
param pytree, plus the host-side audio bucketing helpers that turn stacked
hidden states into per-frame S2V conditioning columns.

Frontend notes (HF Wav2Vec2 semantics, do_stable_layer_norm=True,
feat_extract_norm="layer"):
  * each conv layer: conv1d -> LayerNorm over channels -> exact GELU
  * encoder: x += pos_conv(x) (grouped weight-normed conv, even-kernel
    SamePad trims one step), then pre-LN blocks, final LayerNorm
  * hidden_states[i] is the input of block i (i < L); the last entry is
    the final LayerNorm output -> L+1 states stacked for S2V
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import (init_layer_norm, init_linear, layer_norm, linear,
                         gelu_exact)
from ..ops.attention import sdpa


@dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    intermediate_size: int = 4096
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5


# facebook/wav2vec2-large-xlsr-53 (reference wav2vec.py:50-100)
WAV2VEC2_XLSR_53 = Wav2Vec2Config()

WAV2VEC2_TINY = Wav2Vec2Config(
    hidden_size=32, num_heads=4, num_layers=2, intermediate_size=64,
    conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)


# -- init / convert -----------------------------------------------------------

def init_wav2vec(key, cfg: Wav2Vec2Config, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64 + 8 * cfg.num_layers))
    d = cfg.hidden_size
    convs = []
    in_c = 1
    for out_c, k in zip(cfg.conv_dim, cfg.conv_kernel):
        convs.append({
            "w": (jax.random.normal(next(keys), (out_c, in_c, k), jnp.float32)
                  / math.sqrt(in_c * k)).astype(dtype),
            "b": jnp.zeros((out_c,), dtype),
            "ln": init_layer_norm(out_c, dtype=dtype),
        })
        in_c = out_c
    params = {
        "conv_layers": convs,
        "proj_ln": init_layer_norm(cfg.conv_dim[-1], dtype=dtype),
        "proj": init_linear(next(keys), cfg.conv_dim[-1], d, dtype=dtype),
        "pos_conv": {
            "w": (jax.random.normal(
                next(keys),
                (d, d // cfg.num_conv_pos_embedding_groups,
                 cfg.num_conv_pos_embeddings), jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        },
        "final_ln": init_layer_norm(d, dtype=dtype),
    }
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "ln1": init_layer_norm(d, dtype=dtype),
            "q": init_linear(next(keys), d, d, dtype=dtype),
            "k": init_linear(next(keys), d, d, dtype=dtype),
            "v": init_linear(next(keys), d, d, dtype=dtype),
            "o": init_linear(next(keys), d, d, dtype=dtype),
            "ln2": init_layer_norm(d, dtype=dtype),
            "fc1": init_linear(next(keys), d, cfg.intermediate_size, dtype=dtype),
            "fc2": init_linear(next(keys), cfg.intermediate_size, d, dtype=dtype),
        })
    params["blocks"] = blocks
    return params


def _weight_norm_fold(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm(conv, dim=2): w = g * v / ||v||_(0,1)."""
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm)


def convert_wav2vec(state_dict, cfg: Wav2Vec2Config = WAV2VEC2_XLSR_53,
                    dtype=jnp.float32):
    """HF Wav2Vec2ForCTC / Wav2Vec2Model state dict (optionally wrapped in the
    reference 'model.' prefix, wav2vec.py:199-203) -> our pytree."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("model.").removeprefix("wav2vec2.")
        sd[k] = np.asarray(v.float() if hasattr(v, "float") else v, np.float32)

    def A(k):
        return jnp.asarray(sd[k], dtype)

    convs = []
    for i in range(len(cfg.conv_dim)):
        p = f"feature_extractor.conv_layers.{i}"
        convs.append({
            "w": A(f"{p}.conv.weight"),
            "b": A(f"{p}.conv.bias"),
            "ln": {"scale": A(f"{p}.layer_norm.weight"),
                   "bias": A(f"{p}.layer_norm.bias")},
        })

    # pos conv: fold torch weight-norm (two storage layouts across versions)
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
    elif f"{pc}.parametrizations.weight.original0" in sd:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
    else:
        g, v = None, sd[f"{pc}.weight"]
    w = v if g is None else _weight_norm_fold(g, v)

    params = {
        "conv_layers": convs,
        "proj_ln": {"scale": A("feature_projection.layer_norm.weight"),
                    "bias": A("feature_projection.layer_norm.bias")},
        "proj": {"w": A("feature_projection.projection.weight").T,
                 "b": A("feature_projection.projection.bias")},
        "pos_conv": {"w": jnp.asarray(w, dtype), "b": A(f"{pc}.bias")},
        "final_ln": {"scale": A("encoder.layer_norm.weight"),
                     "bias": A("encoder.layer_norm.bias")},
    }
    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        blocks.append({
            "ln1": {"scale": A(f"{p}.layer_norm.weight"),
                    "bias": A(f"{p}.layer_norm.bias")},
            "q": {"w": A(f"{p}.attention.q_proj.weight").T,
                  "b": A(f"{p}.attention.q_proj.bias")},
            "k": {"w": A(f"{p}.attention.k_proj.weight").T,
                  "b": A(f"{p}.attention.k_proj.bias")},
            "v": {"w": A(f"{p}.attention.v_proj.weight").T,
                  "b": A(f"{p}.attention.v_proj.bias")},
            "o": {"w": A(f"{p}.attention.out_proj.weight").T,
                  "b": A(f"{p}.attention.out_proj.bias")},
            "ln2": {"scale": A(f"{p}.final_layer_norm.weight"),
                    "bias": A(f"{p}.final_layer_norm.bias")},
            "fc1": {"w": A(f"{p}.feed_forward.intermediate_dense.weight").T,
                    "b": A(f"{p}.feed_forward.intermediate_dense.bias")},
            "fc2": {"w": A(f"{p}.feed_forward.output_dense.weight").T,
                    "b": A(f"{p}.feed_forward.output_dense.bias")},
        })
    params["blocks"] = blocks
    return params


# -- forward ------------------------------------------------------------------

def _conv1d(x, w, b=None, stride=1, padding=0, groups=1):
    """x (B, C, T), w (O, I/g, K) -> (B, O, T')."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (stride,),
        [(padding, padding)], feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b.astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype)


def normalize_waveform(audio: np.ndarray) -> np.ndarray:
    """Wav2Vec2Processor zero-mean unit-variance normalization."""
    audio = np.asarray(audio, np.float32)
    return (audio - audio.mean()) / np.sqrt(audio.var() + 1e-7)


def _block(p, cfg: Wav2Vec2Config, x):
    h = layer_norm(p["ln1"], x, eps=cfg.layer_norm_eps)
    B, T, d = h.shape
    n, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    q = linear(p["q"], h).reshape(B, T, n, hd)
    k = linear(p["k"], h).reshape(B, T, n, hd)
    v = linear(p["v"], h).reshape(B, T, n, hd)
    a = sdpa(q, k, v).reshape(B, T, d)
    x = x + linear(p["o"], a)
    h = layer_norm(p["ln2"], x, eps=cfg.layer_norm_eps)
    return x + linear(p["fc2"], gelu_exact(linear(p["fc1"], h)))


def wav2vec_forward(params, cfg: Wav2Vec2Config, input_values):
    """input_values (B, T_samples) -> hidden states (L+1, B, T_feat, d).

    hidden_states[0] is the block-0 input (post pos-conv); the last entry is
    the final-LayerNorm output, matching HF output_hidden_states ordering.
    """
    x = input_values[:, None, :]                      # (B, 1, T)
    for conv, k, s in zip(params["conv_layers"], cfg.conv_kernel,
                          cfg.conv_stride):
        x = _conv1d(x, conv["w"], conv["b"], stride=s)
        x = layer_norm(conv["ln"], x.transpose(0, 2, 1),
                       eps=cfg.layer_norm_eps).transpose(0, 2, 1)
        x = gelu_exact(x)
    feat = x.transpose(0, 2, 1)                       # (B, T_feat, C)

    h = linear(params["proj"],
               layer_norm(params["proj_ln"], feat, eps=cfg.layer_norm_eps))

    # positional conv embedding; even kernel -> SamePad trims the last step
    pad = cfg.num_conv_pos_embeddings // 2
    pos = _conv1d(h.transpose(0, 2, 1), params["pos_conv"]["w"],
                  params["pos_conv"]["b"], padding=pad,
                  groups=cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :, :-1]
    h = h + gelu_exact(pos).transpose(0, 2, 1)

    states = [h]
    for blk in params["blocks"][:-1]:
        h = _block(blk, cfg, h)
        states.append(h)
    h = _block(params["blocks"][-1], cfg, h)
    states.append(layer_norm(params["final_ln"], h, eps=cfg.layer_norm_eps))
    return jnp.stack(states)


# -- host-side bucketing (reference wav2vec.py:7-42,116-186) ------------------

def get_sample_indices(original_fps, total_frames, target_fps, num_sample,
                       fixed_start=None):
    required_duration = num_sample / target_fps
    required_origin_frames = int(np.ceil(required_duration * original_fps))
    if required_duration > total_frames / original_fps:
        raise ValueError("required_duration must be less than video length")
    if fixed_start is not None and fixed_start >= 0:
        start_frame = fixed_start
    else:
        max_start = total_frames - required_origin_frames
        if max_start < 0:
            raise ValueError("video length is too short")
        start_frame = np.random.randint(0, max_start + 1)
    start_time = start_frame / original_fps
    end_time = start_time + required_duration
    time_points = np.linspace(start_time, end_time, num_sample, endpoint=False)
    frame_indices = np.round(time_points * original_fps).astype(int)
    return np.clip(frame_indices, 0, total_frames - 1)


def linear_interpolation(features: np.ndarray, input_fps: float,
                         output_fps: float,
                         output_len: Optional[int] = None) -> np.ndarray:
    """(L, T, D) -> (L, output_len, D); torch linear align_corners=True."""
    L, T, D = features.shape
    if output_len is None:
        output_len = int(T / float(input_fps) * output_fps)
    if output_len == 1:
        src = np.zeros((1,), np.float32)
    else:
        src = np.arange(output_len, dtype=np.float64) * (T - 1) / (output_len - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, T - 1)
    w = (src - lo).astype(np.float32)[None, :, None]
    return (features[:, lo] * (1 - w) + features[:, hi] * w).astype(
        features.dtype)


def get_audio_embed_bucket_fps(audio_embed: np.ndarray, fps: int = 16,
                               batch_frames: int = 81, m: int = 0,
                               video_rate: int = 30):
    """(L, T_audio_frames, D) -> ((bucket, L, D*(2m+1)), min_batch_num)."""
    num_layers, audio_frame_num, audio_dim = audio_embed.shape
    scale = video_rate / fps
    min_batch_num = int(audio_frame_num / (batch_frames * scale)) + 1
    bucket_num = min_batch_num * batch_frames
    padd = math.ceil(min_batch_num * batch_frames / fps * video_rate) \
        - audio_frame_num
    batch_idx = get_sample_indices(
        original_fps=video_rate, total_frames=audio_frame_num + padd,
        target_fps=fps, num_sample=bucket_num, fixed_start=0)
    stride = int(video_rate / fps)
    rows = []
    for bi in batch_idx:
        if bi < audio_frame_num:
            chosen = np.arange(bi - m * stride, bi + (m + 1) * stride, stride)
            chosen = np.clip(chosen, 0, audio_frame_num - 1)
            rows.append(audio_embed[:, chosen].reshape(num_layers, -1))
        else:
            rows.append(np.zeros((num_layers, audio_dim * (2 * m + 1)),
                                 audio_embed.dtype))
    return np.stack(rows), min_batch_num


def extract_audio_feat(params, cfg: Wav2Vec2Config, input_audio: np.ndarray,
                       return_all_layers: bool = False,
                       video_rate: int = 30) -> np.ndarray:
    """Waveform (16 kHz) -> per-video-frame features, (L or 1, T_vid, D)."""
    wav = normalize_waveform(input_audio)[None]
    states = np.asarray(wav2vec_forward(params, cfg, jnp.asarray(wav)),
                        np.float32)[:, 0]             # (L+1, T_feat, D)
    feat = states if return_all_layers else states[-1:]
    return linear_interpolation(feat, input_fps=50, output_fps=video_rate)


def get_audio_feats_per_inference(params, cfg: Wav2Vec2Config,
                                  input_audio: np.ndarray, fps: int = 16,
                                  batch_frames: int = 80, m: int = 0,
                                  video_rate: int = 30) -> List[np.ndarray]:
    """Reference get_audio_feats_per_inference (wav2vec.py:188-193): list of
    (1, L, D*(2m+1), batch_frames) S2V conditioning chunks."""
    feat = extract_audio_feat(params, cfg, input_audio,
                              return_all_layers=True, video_rate=video_rate)
    bucket, n = get_audio_embed_bucket_fps(feat, fps=fps,
                                           batch_frames=batch_frames, m=m,
                                           video_rate=video_rate)
    bucket = bucket[None].transpose(0, 2, 3, 1)       # (1, L, D', bucket)
    return [bucket[..., i * batch_frames:(i + 1) * batch_frames]
            for i in range(n)]
