"""Small FLUX conditioning adapters, TPU-native.

Three reference adapters that feed extra tokens / branch conditioning into
the FLUX DiT:

- InfiniteYou image projector — a Perceiver resampler lifting a 512-d
  ArcFace identity embedding to ControlNet prompt tokens
  (/root/reference/diffsynth/models/flux_infiniteyou.py:76-129).
- Value controller — sinusoidal scalar-preference encoders whose learned
  token sequences are appended to the text embedding
  (/root/reference/diffsynth/models/flux_value_control.py:5-60).
- FLUX LoRA encoder — embeds a LoRA checkpoint itself (per-layer A/B
  factors contracted against learned probe tokens) into prompt tokens
  (/root/reference/diffsynth/models/flux_lora_encoder.py:5-111).

All are pure pytree-parameter functions; the ArcFace/insightface face
detection that produces the 512-d id embedding is host-side preprocessing
(see pipelines/flux_image.py) and is import-gated like the other optional
CV dependencies.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm, init_linear, init_layer_norm


# ---------------------------------------------------------------------------
# InfiniteYou image projector (flux_infiniteyou.py:28-116)
# ---------------------------------------------------------------------------

def _perceiver_attention(p, x, latents, heads: int, dim_head: int):
    """PerceiverAttention.forward (flux_infiniteyou.py:44-73): latents query
    [x | latents]; the symmetric sqrt(sqrt(d)) scaling is kept for bf16
    stability."""
    x = layer_norm(p["norm1"], x, 1e-5)
    latents = layer_norm(p["norm2"], latents, 1e-5)
    b, l, _ = latents.shape
    q = linear(p["to_q"], latents)
    kv_in = jnp.concatenate([x, latents], axis=-2)
    k, v = jnp.split(linear(p["to_kv"], kv_in), 2, axis=-1)

    def heads_first(t):
        return t.reshape(b, t.shape[1], heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = heads_first(q), heads_first(k), heads_first(v)
    scale = 1.0 / np.sqrt(np.sqrt(dim_head))
    w = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, heads * dim_head)
    return linear(p["to_out"], out)


def _ff(p, x):
    """FeedForward (flux_infiniteyou.py:7-14): LN -> Linear -> GELU -> Linear
    (no biases)."""
    h = layer_norm(p["norm"], x, 1e-5)
    h = linear(p["fc1"], h)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return linear(p["fc2"], h)


def infiniteyou_projector_forward(params, id_emb, heads: int = 20,
                                  dim_head: int = 64):
    """InfiniteYouImageProjector.forward (flux_infiniteyou.py:104-116):
    id_emb (B, n, 512) -> (B, num_queries, 4096) ControlNet prompt tokens."""
    latents = jnp.broadcast_to(
        params["latents"].astype(id_emb.dtype),
        (id_emb.shape[0],) + params["latents"].shape[1:])
    x = linear(params["proj_in"], id_emb)
    for i in sorted(params["layers"], key=int):
        p = params["layers"][i]
        latents = _perceiver_attention(p["attn"], x, latents, heads,
                                       dim_head) + latents
        latents = _ff(p["ff"], latents) + latents
    out = linear(params["proj_out"], latents)
    return layer_norm(params["norm_out"], out, 1e-5)


def convert_infiniteyou_projector(sd, dtype=jnp.bfloat16):
    """Torch InfiniteYouImageProjector state dict (already unwrapped from the
    'image_proj' bundle by the loader) -> pytree."""
    t = {k: jnp.asarray(np.asarray(v.float() if hasattr(v, "float") else v),
                        dtype) for k, v in sd.items()}

    def lin(prefix, bias=False):
        p = {"w": t[prefix + ".weight"].T}
        if bias and prefix + ".bias" in t:
            p["b"] = t[prefix + ".bias"]
        return p

    def ln(prefix):
        return {"scale": t[prefix + ".weight"], "bias": t[prefix + ".bias"]}

    layers = {}
    i = 0
    while f"layers.{i}.0.to_q.weight" in t:
        layers[str(i)] = {
            "attn": {
                "norm1": ln(f"layers.{i}.0.norm1"),
                "norm2": ln(f"layers.{i}.0.norm2"),
                "to_q": lin(f"layers.{i}.0.to_q"),
                "to_kv": lin(f"layers.{i}.0.to_kv"),
                "to_out": lin(f"layers.{i}.0.to_out"),
            },
            "ff": {
                "norm": ln(f"layers.{i}.1.0"),
                "fc1": lin(f"layers.{i}.1.1"),
                "fc2": lin(f"layers.{i}.1.3"),
            },
        }
        i += 1
    return {
        "latents": t["latents"],
        "proj_in": lin("proj_in", bias=True),
        "proj_out": lin("proj_out", bias=True),
        "norm_out": ln("norm_out"),
        "layers": layers,
    }


def init_infiniteyou_projector(key, dim=64, depth=2, dim_head=8, heads=8,
                               num_queries=4, embedding_dim=512,
                               output_dim=64, ff_mult=4, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 3 + 5 * depth))
    inner = dim_head * heads
    layers = {}
    for i in range(depth):
        layers[str(i)] = {
            "attn": {
                "norm1": init_layer_norm(dim, dtype=dtype),
                "norm2": init_layer_norm(dim, dtype=dtype),
                "to_q": init_linear(next(ks), dim, inner, bias=False,
                                    dtype=dtype),
                "to_kv": init_linear(next(ks), dim, inner * 2, bias=False,
                                     dtype=dtype),
                "to_out": init_linear(next(ks), inner, dim, bias=False,
                                      dtype=dtype),
            },
            "ff": {
                "norm": init_layer_norm(dim, dtype=dtype),
                "fc1": init_linear(next(ks), dim, dim * ff_mult, bias=False,
                                   dtype=dtype),
                "fc2": init_linear(next(ks), dim * ff_mult, dim, bias=False,
                                   dtype=dtype),
            },
        }
    return {
        "latents": jax.random.normal(next(ks), (1, num_queries, dim),
                                     dtype) / dim ** 0.5,
        "proj_in": init_linear(next(ks), embedding_dim, dim, dtype=dtype),
        "proj_out": init_linear(next(ks), dim, output_dim, dtype=dtype),
        "norm_out": init_layer_norm(output_dim, dtype=dtype),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Value controller (flux_value_control.py:20-45)
# ---------------------------------------------------------------------------

def single_value_encoder_forward(params, value):
    """SingleValueEncoder.forward (flux_value_control.py:38-45): scalar in
    [0,1] -> (prefer_len, dim_out) learned token sequence; prefer_len comes
    from the positional-embedding parameter."""
    from .svd import timestep_embedding_flip
    dim_in = params["fc1"]["w"].shape[0]
    prefer_len = params["pos"].shape[0]
    emb = timestep_embedding_flip(value * 1000.0, dim_in)
    emb = emb.astype(params["fc1"]["w"].dtype)
    emb = linear(params["fc2"], jax.nn.silu(linear(params["fc1"], emb)))
    base = jnp.broadcast_to(emb, (prefer_len, emb.shape[-1]))
    return base + params["pos"].astype(base.dtype)


def multi_value_encoder_forward(param_list, values):
    """MultiValueEncoder.__call__ (flux_value_control.py:10-17): one token
    block per non-None value, concatenated along tokens."""
    embs = [single_value_encoder_forward(p, jnp.asarray([v], jnp.float32))
            for p, v in zip(param_list, values) if v is not None]
    return jnp.concatenate(embs, axis=0)


def convert_value_encoder(sd, dtype=jnp.bfloat16):
    t = {k: jnp.asarray(np.asarray(v.float() if hasattr(v, "float") else v),
                        dtype) for k, v in sd.items()}
    return {
        "fc1": {"w": t["prefer_value_embedder.0.weight"].T,
                "b": t["prefer_value_embedder.0.bias"]},
        "fc2": {"w": t["prefer_value_embedder.2.weight"].T,
                "b": t["prefer_value_embedder.2.bias"]},
        "pos": t["positional_embedding"],
    }


def init_value_encoder(key, dim_in=16, dim_out=32, prefer_len=4,
                       dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": init_linear(k1, dim_in, dim_out, dtype=dtype),
        "fc2": init_linear(k2, dim_out, dim_out, dtype=dtype),
        "pos": jax.random.normal(k3, (prefer_len, dim_out), dtype),
    }


# ---------------------------------------------------------------------------
# FLUX LoRA encoder (flux_lora_encoder.py:5-111)
# ---------------------------------------------------------------------------

def default_lora_patterns():
    """FluxLoRAEncoder's probe inventory (flux_lora_encoder.py:39-60): the
    10 LoRA-targeted projections of each of the 19 joint blocks plus 3 of
    each of the 38 single blocks."""
    patterns = []
    joint = {
        "attn.a_to_qkv": (3072, 9216), "attn.a_to_out": (3072, 3072),
        "ff_a.0": (3072, 12288), "ff_a.2": (12288, 3072),
        "norm1_a.linear": (3072, 18432),
        "attn.b_to_qkv": (3072, 9216), "attn.b_to_out": (3072, 3072),
        "ff_b.0": (3072, 12288), "ff_b.2": (12288, 3072),
        "norm1_b.linear": (3072, 18432),
    }
    for i in range(19):
        for suffix, dim in joint.items():
            patterns.append({"name": f"blocks.{i}.{suffix}", "dim": dim,
                             "type": suffix})
    single = {"to_qkv_mlp": (3072, 21504), "proj_out": (15360, 3072),
              "norm.linear": (3072, 9216)}
    for i in range(38):
        for suffix, dim in single.items():
            patterns.append({"name": f"single_blocks.{i}.{suffix}",
                             "dim": dim, "type": suffix})
    return patterns


def _lora_layer_block(p, lora_A, lora_B):
    """LoRALayerBlock.forward (flux_lora_encoder.py:11-14): probe tokens
    x (1, L, dim_in) pushed through the low-rank update A^T B^T, then LN."""
    h = p["x"] @ lora_A.T @ lora_B.T
    return layer_norm(p["layer_norm"], h, 1e-5)


def flux_lora_encoder_forward(params, lora, patterns=None,
                              num_heads: int = 32):
    """FluxLoRAEncoder.forward (flux_lora_encoder.py:93-102): a LoRA state
    dict (diffsynth-layout `...lora_A.default.weight` keys, as produced by
    FluxLoRAConverter / our flux_lora converter) -> (1, num_special, 4096)
    conditioning tokens.

    The per-layer probe blocks run as a host loop over the pattern
    inventory (980 tiny matmuls with heterogeneous shapes — not a scan
    candidate); the transformer encoder over the assembled sequence is the
    XLA-compiled part.
    """
    from .sdxl import _clip_layer
    if patterns is None:
        patterns = default_lora_patterns()
    def fetch(name, tag):
        for suffix in (f".{tag}.default.weight", f".{tag}.weight"):
            if name + suffix in lora:
                return jnp.asarray(lora[name + suffix])
        raise KeyError(f"{name}.{tag} missing from LoRA for the encoder")

    embs = []
    for pat in patterns:
        name, typ = pat["name"], pat["type"]
        lora_A = fetch(name, "lora_A")
        lora_B = fetch(name, "lora_B")
        h = _lora_layer_block(params["model_dict"][name.replace(".", "___")],
                              lora_A, lora_B)
        h = linear(params["proj_dict"][typ.replace(".", "___")], h)
        embs.append(h)
    lora_emb = jnp.concatenate(embs, axis=1)
    special = params["special_embeds"].astype(lora_emb.dtype)
    x = jnp.concatenate([special, lora_emb], axis=1)
    for i in sorted(params["encoders"], key=int):
        # CLIPEncoderLayer defaults to quickGELU (sd_text_encoder.py:6-17)
        x = _clip_layer(params["encoders"][i], x, None, num_heads, True)
    x = x[:, :special.shape[1]]
    x = layer_norm(params["final_layer_norm"], x, 1e-5)
    return linear(params["final_linear"], x)


def convert_flux_lora_encoder(sd, dtype=jnp.bfloat16):
    t = {k: jnp.asarray(np.asarray(v.float() if hasattr(v, "float") else v),
                        dtype) for k, v in sd.items()}

    def lin(prefix):
        p = {"w": t[prefix + ".weight"].T}
        if prefix + ".bias" in t:
            p["b"] = t[prefix + ".bias"]
        return p

    def ln(prefix):
        return {"scale": t[prefix + ".weight"], "bias": t[prefix + ".bias"]}

    model_dict = {}
    for k in t:
        if k.startswith("embedder.model_dict.") and k.endswith(".x"):
            name = k[len("embedder.model_dict."):-len(".x")]
            model_dict[name] = {
                "x": t[k],
                "layer_norm": ln(f"embedder.model_dict.{name}.layer_norm"),
            }
    proj_dict = {}
    for k in t:
        if k.startswith("embedder.proj_dict.") and k.endswith(".weight"):
            name = k[len("embedder.proj_dict."):-len(".weight")]
            proj_dict[name] = lin(f"embedder.proj_dict.{name}")

    from .sdxl import convert_sdxl_module
    enc_sd = {k: v for k, v in sd.items() if k.startswith("encoders.")}
    encoders = convert_sdxl_module(enc_sd, dtype)["encoders"]
    return {
        "model_dict": model_dict,
        "proj_dict": proj_dict,
        "encoders": encoders,
        "special_embeds": t["special_embeds"],
        "final_layer_norm": ln("final_layer_norm"),
        "final_linear": lin("final_linear"),
    }
