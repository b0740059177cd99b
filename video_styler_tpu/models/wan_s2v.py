"""Wan2.2 S2V (speech-to-video) DiT, TPU-native.

Functional port of WanS2VModel
(/root/reference/diffsynth/models/wan_video_dit_s2v.py:27-625):

  - segment RoPE precompute: main video grid, reference frame at temporal
    offset 30, and frame-packed motion latents at negative time indices
    (conjugated rotations) — emitted as host-side (cos, sin) tables
  - CausalAudioEncoder: learned layer-weighted wav2vec features through a
    causal conv1d pyramid (replicate padding), local tokens + global track
  - FramePackMotioner: 1x/2x/4x conv projections of trailing motion latents
  - AudioInjector: per-injected-layer cross-attention from video tokens
    (grouped per frame) to audio tokens, with AdaLN from the global track
  - dual t_mod: x tokens modulated by the timestep, ref/motion tokens by a
    zero timestep

Audio features come from a wav2vec tower; use
transformers.Wav2Vec2Model for extraction (the pipeline also accepts
precomputed `audio_embeds` like the reference unit does).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from einops import rearrange

from ..ops.basic import (linear, layer_norm, rms_norm, silu, modulate,
                         sinusoidal_embedding_1d)
from ..ops.rope import precompute_freqs_3d, rope_apply
from ..ops.attention import attention
from .wan_dit import (WanDiTConfig, self_attention, cross_attention, ffn,
                      text_embed, time_embed, head, unpatchify)


@dataclass(frozen=True)
class WanS2VConfig:
    dim: int = 5120
    in_dim: int = 16
    ffn_dim: int = 13824
    out_dim: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 40
    num_layers: int = 40
    cond_dim: int = 16
    audio_dim: int = 1024
    num_audio_token: int = 4
    num_audio_layers: int = 25
    enable_adain: bool = True
    audio_inject_layers: Tuple[int, ...] = (0, 4, 8, 12, 16, 20, 24, 27, 30, 33, 36, 39)

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    def dit_cfg(self) -> WanDiTConfig:
        return WanDiTConfig(dim=self.dim, in_dim=self.in_dim,
                            ffn_dim=self.ffn_dim, out_dim=self.out_dim,
                            num_heads=self.num_heads, num_layers=self.num_layers,
                            text_dim=self.text_dim, freq_dim=self.freq_dim,
                            eps=self.eps, patch_size=self.patch_size)


WAN_S2V_14B = WanS2VConfig()
WAN_S2V_TINY = WanS2VConfig(dim=96, in_dim=4, ffn_dim=192, out_dim=4,
                            text_dim=64, freq_dim=32, num_heads=2,
                            num_layers=2, cond_dim=4, audio_dim=16,
                            num_audio_token=2, num_audio_layers=3,
                            audio_inject_layers=(0, 1))


# ------------------------------------------------------------------ RoPE

def s2v_rope_segments(head_dim: int, segments: List[dict]) -> Tuple[np.ndarray, np.ndarray]:
    """Build per-token (cos, sin) for a list of grid segments.

    Each segment: {"start": (f_o,h_o,w_o), "end": (f,h,w), "total": (tf,th,tw)}
    following rope_precompute (wan_video_dit_s2v.py:27-86): token count is
    prod(end-start); temporal indices are linspace-sampled when total !=
    seq counts; negative f_o conjugates the temporal rotation.
    """
    (cf, sf), (ch, sh), (cw, sw) = precompute_freqs_3d(head_dim)
    cos_out, sin_out = [], []
    for seg in segments:
        f_o, h_o, w_o = seg["start"]
        f, h, w = seg["end"]
        t_f, t_h, t_w = seg["total"]
        seq_f, seq_h, seq_w = f - f_o, h - h_o, w - w_o
        if seq_f * seq_h * seq_w <= 0:
            continue
        if f_o >= 0:
            f_sam = np.linspace(f_o, t_f + f_o - 1, seq_f).astype(int)
            conj = False
        else:
            f_sam = np.linspace(-f_o, -t_f - f_o + 1, seq_f).astype(int)
            conj = True
        h_sam = np.linspace(h_o, t_h + h_o - 1, seq_h).astype(int)
        w_sam = np.linspace(w_o, t_w + w_o - 1, seq_w).astype(int)
        cfo = np.asarray(cf)[f_sam]
        sfo = np.asarray(sf)[f_sam] * (-1.0 if conj else 1.0)

        def grid(af, ah, aw):
            out = np.concatenate([
                np.broadcast_to(af[:, None, None, :], (seq_f, seq_h, seq_w, af.shape[-1])),
                np.broadcast_to(ah[None, :, None, :], (seq_f, seq_h, seq_w, ah.shape[-1])),
                np.broadcast_to(aw[None, None, :, :], (seq_f, seq_h, seq_w, aw.shape[-1])),
            ], axis=-1)
            return out.reshape(seq_f * seq_h * seq_w, -1)

        cos_out.append(grid(cfo, np.asarray(ch)[h_sam], np.asarray(cw)[w_sam]))
        sin_out.append(grid(sfo, np.asarray(sh)[h_sam], np.asarray(sw)[w_sam]))
    return (np.concatenate(cos_out).astype(np.float32),
            np.concatenate(sin_out).astype(np.float32))


# ------------------------------------------------------------------ audio

def causal_conv1d(p, x, stride: int = 1, pad_mode: str = "edge"):
    """CausalConv1d (wan_video_dit_s2v.py:89-104): replicate left-pad k-1.
    x: (B, C, T)."""
    k = p["weight"].shape[2]
    x = jnp.pad(x, ((0, 0), (0, 0), (k - 1, 0)), mode=pad_mode)
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride,), [(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)[None, :, None]).astype(x.dtype)


def motion_encoder_tc(p, x, num_heads: int, need_global: bool):
    """MotionEncoder_tc (wan_video_dit_s2v.py:107-169). x: (B, T, C)."""
    x = x.transpose(0, 2, 1)                 # (B, C, T)
    x_ori = x
    b = x.shape[0]
    x = causal_conv1d(p["conv1_local"]["conv"], x)
    x = rearrange(x, "b (n c) t -> (b n) t c", n=num_heads)
    x = layer_norm({}, x, 1e-6)
    x = silu(x)
    x = causal_conv1d(p["conv2"]["conv"], x.transpose(0, 2, 1), stride=2)
    x = layer_norm({}, x.transpose(0, 2, 1), 1e-6)
    x = silu(x)
    x = causal_conv1d(p["conv3"]["conv"], x.transpose(0, 2, 1), stride=2)
    x = layer_norm({}, x.transpose(0, 2, 1), 1e-6)
    x = silu(x)
    x = rearrange(x, "(b n) t c -> b t n c", b=b)
    padding = jnp.broadcast_to(p["padding_tokens"].astype(x.dtype),
                               (b, x.shape[1], 1, x.shape[-1]))
    x_local = jnp.concatenate([x, padding], axis=-2)
    if not need_global:
        return None, x_local

    x = causal_conv1d(p["conv1_global"]["conv"], x_ori)
    x = layer_norm({}, x.transpose(0, 2, 1), 1e-6)
    x = silu(x)
    x = causal_conv1d(p["conv2"]["conv"], x.transpose(0, 2, 1), stride=2)
    x = layer_norm({}, x.transpose(0, 2, 1), 1e-6)
    x = silu(x)
    x = causal_conv1d(p["conv3"]["conv"], x.transpose(0, 2, 1), stride=2)
    x = layer_norm({}, x.transpose(0, 2, 1), 1e-6)
    x = silu(x)
    x = linear(p["final_linear"], x)
    x_global = rearrange(x, "(b n) t c -> b t n c", b=b)
    return x_global, x_local


def causal_audio_encoder(p, features, num_token: int, need_global: bool):
    """CausalAudioEncoder (wan_video_dit_s2v.py:323-339).
    features: (B, num_layers, dim, T)."""
    weights = silu(p["weights"].astype(features.dtype))
    weighted = (features * weights / weights.sum(axis=1, keepdims=True)).sum(axis=1)
    weighted = weighted.transpose(0, 2, 1)           # (B, T, dim)
    return motion_encoder_tc(p["encoder"], weighted, num_token, need_global)


def cal_audio_emb(p, audio_input, num_token: int, enable_adain: bool,
                  motion_frames=(73, 19)):
    """wan_video_dit_s2v.py:485-490."""
    first = jnp.repeat(audio_input[..., 0:1], motion_frames[0], axis=-1)
    audio_input = jnp.concatenate([first, audio_input], axis=-1)
    audio_emb_global, audio_emb = causal_audio_encoder(
        p["casual_audio_encoder"], audio_input, num_token, enable_adain)
    if audio_emb_global is not None:
        audio_emb_global = audio_emb_global[:, motion_frames[1]:]
    return audio_emb_global, audio_emb[:, motion_frames[1]:]


def ada_layer_norm(p, x, temb):
    """AdaLayerNorm (wan_video_dit_s2v.py:261-280)."""
    temb = linear(p["linear"], silu(temb))
    shift, scale = jnp.split(temb, 2, axis=1)
    return layer_norm({}, x, 1e-5) * (1 + scale[:, None, :]) + shift[:, None, :]


def audio_inject(p, idx: int, x, audio_emb_global, audio_emb,
                 seq_len_x: int, cfg: WanS2VConfig):
    """after_transformer_block audio injection (wan_video_dit_s2v.py:449-474)."""
    num_frames = audio_emb.shape[1]
    tokens = x[:, :seq_len_x]
    b = tokens.shape[0]
    tokens_f = rearrange(tokens, "b (t n) c -> (b t) n c", t=num_frames)
    if cfg.enable_adain:
        temb = rearrange(audio_emb_global, "b t n c -> (b t) n c")[:, 0]
        tokens_f = ada_layer_norm(p["injector_adain_layers"][str(idx)],
                                  tokens_f, temb)
    audio = rearrange(audio_emb, "b t n c -> (b t) n c")
    res = cross_attention(p["injector"][str(idx)], tokens_f, audio,
                          cfg.num_heads, cfg.eps)
    res = rearrange(res, "(b t) n c -> b (t n) c", b=b)
    return x.at[:, :seq_len_x].add(res.astype(x.dtype))


# ------------------------------------------------------------------ motion

def frame_pack_motion(p, motion_latents, cfg: WanS2VConfig,
                      zip_frame_buckets=(1, 2, 16), add_last_motion: int = 2,
                      drop_mode: str = "padd"):
    """FramePackMotioner (wan_video_dit_s2v.py:172-258) for batch size 1.
    motion_latents: (16ch, T, H, W). Returns (tokens (1,S,D), cos, sin)."""
    m = motion_latents
    lat_h, lat_w = m.shape[2], m.shape[3]
    total = sum(zip_frame_buckets)
    padd = np.zeros((m.shape[0], total, lat_h, lat_w), np.float32)
    overlap = min(total, m.shape[1])
    if overlap > 0:
        padd[:, -overlap:] = np.asarray(m[:, -overlap:], np.float32)
    padd = jnp.asarray(padd)[None]
    splits = list(zip_frame_buckets)[::-1]          # [16, 2, 1]
    c4x = padd[:, :, :splits[0]]
    c2x = padd[:, :, splits[0]:splits[0] + splits[1]]
    cpost = padd[:, :, splits[0] + splits[1]:]

    def proj(pp, x, k):
        w = pp["weight"]
        kt, khh, kww = w.shape[2:]
        pt = rearrange(x, "b c (f kt) (h kh) (w kw) -> b (f h w) (c kt kh kw)",
                       kt=kt, kh=khh, kw=kww)
        wf = w.reshape(w.shape[0], -1).T
        out = pt @ jnp.asarray(wf, pt.dtype) + pp["bias"]
        return out

    post_tokens = proj(p["proj"], cpost, 1)
    tokens_2x = proj(p["proj_2x"], c2x, 2)
    tokens_4x = proj(p["proj_4x"], c4x, 4)
    tokens = jnp.concatenate([post_tokens, tokens_2x, tokens_4x], axis=1)

    zb = list(zip_frame_buckets)
    segments = [
        {"start": (-zb[0], 0, 0), "end": (0, lat_h // 2, lat_w // 2),
         "total": (zb[0], lat_h // 2, lat_w // 2)},
        {"start": (-(zb[0] + zb[1]), 0, 0),
         "end": (-(zb[0] + zb[1]) + zb[1] // 2, lat_h // 4, lat_w // 4),
         "total": (zb[1], lat_h // 2, lat_w // 2)},
        {"start": (-(zb[0] + zb[1] + zb[2]), 0, 0),
         "end": (-(zb[0] + zb[1] + zb[2]) + zb[2] // 4, lat_h // 8, lat_w // 8),
         "total": (zb[2], lat_h // 2, lat_w // 2)},
    ]
    cos, sin = s2v_rope_segments(cfg.head_dim, segments)
    return tokens, cos, sin


# ------------------------------------------------------------------ blocks

def s2v_dit_block(p, x, context, t_mod2, seq_len_x: int, cos, sin,
                  cfg: WanS2VConfig):
    """WanS2VDiTBlock (wan_video_dit_s2v.py:342-358): per-token selection of
    timestep (x tokens) vs zero-timestep (ref/motion tokens) modulation.

    t_mod2: (2, 6, D) — [timestep, zero-timestep] modulation rows.
    """
    s_total = x.shape[1]
    mod = p["modulation"][0].astype(t_mod2.dtype)[None] + t_mod2  # (2, 6, D)
    terms = []
    for i in range(6):
        a = mod[0, i][None, None, :]
        b_ = mod[1, i][None, None, :]
        sel = jnp.concatenate([
            jnp.broadcast_to(a, (1, seq_len_x, cfg.dim)),
            jnp.broadcast_to(b_, (1, s_total - seq_len_x, cfg.dim))], axis=1)
        terms.append(sel)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = terms
    h = modulate(layer_norm({}, x, cfg.eps), shift_msa, scale_msa)
    x = x + gate_msa * self_attention(p["self_attn"], h, cos, sin,
                                      cfg.num_heads, cfg.eps)
    x = x + cross_attention(p["cross_attn"], layer_norm(p["norm3"], x, cfg.eps),
                            context, cfg.num_heads, cfg.eps)
    h = modulate(layer_norm({}, x, cfg.eps), shift_mlp, scale_mlp)
    x = x + gate_mlp * ffn(p["ffn"], h)
    return x


def wan_s2v_forward(params, cfg: WanS2VConfig, latents, timestep, context,
                    audio_input, motion_latents=None, pose_cond=None,
                    motion_frames=(73, 19), drop_motion_frames: bool = True):
    """WanS2VModel.forward (wan_video_dit_s2v.py:506-586).

    latents: (1, C, 1+F, H, W) — frame 0 is the reference latent.
    audio_input: (1, num_layers, audio_dim, F_video).
    """
    origin_ref = latents[:, :, 0:1]
    x_lat = latents[:, :, 1:]
    ctx = text_embed(params, context)
    audio_emb_global, merged_audio_emb = cal_audio_emb(
        params, audio_input, cfg.num_audio_token, cfg.enable_adain,
        motion_frames)

    pose = jnp.zeros_like(x_lat) if pose_cond is None else pose_cond
    pt, ph, pw = cfg.patch_size

    def patch(pp, v):
        tok = rearrange(v, "b c (f kt) (h kh) (w kw) -> b (f h w) (c kt kh kw)",
                        kt=pt, kh=ph, kw=pw)
        w = pp["w"]
        out = tok @ w.astype(tok.dtype)
        if "b" in pp:
            out = out + pp["b"]
        return out

    f = x_lat.shape[2] // pt
    h = x_lat.shape[3] // ph
    w = x_lat.shape[4] // pw
    x = patch(params["patch_embedding"], x_lat) + patch(params["cond_encoder"], pose)
    seq_len_x = x.shape[1]

    ref_tokens = patch(params["patch_embedding"], origin_ref)
    rh, rw = origin_ref.shape[3] // ph, origin_ref.shape[4] // pw
    x = jnp.concatenate([x, ref_tokens], axis=1)
    mask = np.concatenate([np.zeros(seq_len_x, np.int32),
                           np.ones(ref_tokens.shape[1], np.int32)])

    segments = [
        {"start": (0, 0, 0), "end": (f, h, w), "total": (f, h, w)},
        {"start": (30, 0, 0), "end": (31, rh, rw), "total": (1, rh, rw)},
    ]
    cos, sin = s2v_rope_segments(cfg.head_dim, segments)

    # the reference drops motion tokens unless explicitly enabled
    # (inject_motion default drop_motion_frames=True, wan_video_dit_s2v.py:441)
    if motion_latents is not None and not drop_motion_frames:
        mot_tokens, mot_cos, mot_sin = frame_pack_motion(
            params["frame_packer"], motion_latents, cfg)
        x = jnp.concatenate([x, mot_tokens.astype(x.dtype)], axis=1)
        cos = np.concatenate([cos, mot_cos])
        sin = np.concatenate([sin, mot_sin])
        mask = np.concatenate([mask, np.full(mot_tokens.shape[1], 2, np.int32)])

    x = x + jnp.take(params["trainable_cond_mask"], jnp.asarray(mask),
                     axis=0).astype(x.dtype)[None]

    ts2 = jnp.concatenate([timestep.astype(jnp.float32),
                           jnp.zeros((1,), jnp.float32)])
    t, t_mod = time_embed(params, cfg, ts2)       # t (2, D); t_mod (2, 6, D)

    cos_j, sin_j = jnp.asarray(cos), jnp.asarray(sin)
    for i in range(cfg.num_layers):
        bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        x = s2v_dit_block(bp, x, ctx, t_mod, seq_len_x, cos_j, sin_j, cfg)
        if i in cfg.audio_inject_layers:
            idx = cfg.audio_inject_layers.index(i)
            x = audio_inject(params["audio_injector"], idx, x,
                             audio_emb_global, merged_audio_emb, seq_len_x, cfg)

    x = x[:, :seq_len_x]
    out = head(params, cfg.dit_cfg(), x, t[:1])
    out = unpatchify(out, (f, h, w), cfg.patch_size, cfg.out_dim)
    return jnp.concatenate([origin_ref, out], axis=2)


# ------------------------------------------------------------------ convert

def convert_wan_s2v(sd, cfg: WanS2VConfig, dtype=jnp.float32):
    """Reference WanS2VModel state dict -> pytree."""
    from ..utils.convert import _lin, _ln, _j, _conv_as_lin, _dit_block, _attn
    from .wan_dit import stack_blocks

    def conv1d(prefix):
        return {"weight": _j(sd[f"{prefix}.weight"], dtype),
                "bias": _j(sd[f"{prefix}.bias"], dtype)}

    enc = "casual_audio_encoder.encoder"
    audio_encoder = {
        "weights": _j(sd["casual_audio_encoder.weights"], dtype),
        "encoder": {
            "conv1_local": {"conv": conv1d(f"{enc}.conv1_local.conv")},
            "conv2": {"conv": conv1d(f"{enc}.conv2.conv")},
            "conv3": {"conv": conv1d(f"{enc}.conv3.conv")},
            "padding_tokens": _j(sd[f"{enc}.padding_tokens"], dtype),
        },
    }
    if f"{enc}.conv1_global.conv.weight" in sd:
        audio_encoder["encoder"]["conv1_global"] = {
            "conv": conv1d(f"{enc}.conv1_global.conv")}
        audio_encoder["encoder"]["final_linear"] = _lin(sd, f"{enc}.final_linear", dtype)

    injector = {"injector": {}, "injector_adain_layers": {}}
    n_inject = len(cfg.audio_inject_layers)
    for i in range(n_inject):
        injector["injector"][str(i)] = _attn(sd, f"audio_injector.injector.{i}", dtype)
        if cfg.enable_adain:
            injector["injector_adain_layers"][str(i)] = {
                "linear": _lin(sd, f"audio_injector.injector_adain_layers.{i}.linear", dtype)}

    def raw_conv(prefix):
        return {"weight": _j(sd[f"{prefix}.weight"], dtype),
                "bias": _j(sd[f"{prefix}.bias"], dtype)}

    return {
        "patch_embedding": _conv_as_lin(sd, "patch_embedding", dtype),
        "cond_encoder": _conv_as_lin(sd, "cond_encoder", dtype),
        "text_embedding": {"fc1": _lin(sd, "text_embedding.0", dtype),
                           "fc2": _lin(sd, "text_embedding.2", dtype)},
        "time_embedding": {"fc1": _lin(sd, "time_embedding.0", dtype),
                           "fc2": _lin(sd, "time_embedding.2", dtype)},
        "time_projection": _lin(sd, "time_projection.1", dtype),
        "head": {"head": _lin(sd, "head.head", dtype),
                 "modulation": _j(sd["head.modulation"], dtype)},
        "blocks": stack_blocks([_dit_block(sd, f"blocks.{i}", dtype, False)
                                for i in range(cfg.num_layers)]),
        "trainable_cond_mask": _j(sd["trainable_cond_mask.weight"], dtype),
        "casual_audio_encoder": audio_encoder,
        "audio_injector": injector,
        "frame_packer": {"proj": raw_conv("frame_packer.proj"),
                         "proj_2x": raw_conv("frame_packer.proj_2x"),
                         "proj_4x": raw_conv("frame_packer.proj_4x")},
    }
