"""Golden parity: our SD3 MM-DiT vs the reference SD3DiT
(/root/reference/diffsynth/models/sd3_dit.py:342-400), including the SD3.5
variants (per-head QK RMSNorm + dual blocks)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.sd3_dit import (
    SD3_DIT_TINY, SD3DiTConfig, init_sd3_dit, convert_sd3_dit,
    sd3_dit_forward, infer_sd3_config)
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def _ref_model(cfg):
    import torch
    mod = load_ref("models.sd3_dit")
    torch.manual_seed(0)
    model = mod.SD3DiT(embed_dim=cfg.dim, num_layers=cfg.num_layers,
                       use_rms_norm=cfg.use_rms_norm,
                       num_dual_blocks=cfg.num_dual_blocks,
                       pos_embed_max_size=cfg.pos_embed_max_size).eval()
    # tiny context/pooled dims: rebuild the two input embedders
    model.pooled_text_embedder[0] = torch.nn.Linear(cfg.pooled_dim, cfg.dim)
    model.context_embedder = torch.nn.Linear(cfg.context_dim, cfg.dim)
    return model


def _run_parity(cfg):
    import torch
    model = _ref_model(cfg)
    # pos_embed is zero-init in the reference; randomize for a meaningful test
    with torch.no_grad():
        model.pos_embedder.pos_embed.normal_()
    params = convert_sd3_dit(model.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 16)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    ctx = rng.standard_normal((1, 8, cfg.context_dim)).astype(np.float32)
    pooled = rng.standard_normal((1, cfg.pooled_dim)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(ctx), torch.from_numpy(pooled)).numpy()
    got = np.asarray(sd3_dit_forward(params, cfg, jnp.asarray(x),
                                     jnp.asarray(t), jnp.asarray(ctx),
                                     jnp.asarray(pooled)), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sd3_dit_parity_medium_style():
    _run_parity(SD3DiTConfig(dim=128, num_layers=3, pos_embed_max_size=16,
                             context_dim=64, pooled_dim=32))


def test_sd3_dit_parity_sd35_style():
    _run_parity(SD3_DIT_TINY)   # rms norm + 1 dual block


def test_sd3_infer_config():
    import torch
    cfg = SD3_DIT_TINY
    model = _ref_model(cfg)
    got = infer_sd3_config(model.state_dict())
    assert got.dim == cfg.dim
    assert got.num_layers == cfg.num_layers
    assert got.num_dual_blocks == cfg.num_dual_blocks
    assert got.use_rms_norm == cfg.use_rms_norm
    assert got.pos_embed_max_size == cfg.pos_embed_max_size


def test_sd3_civitai_rename_roundtrip():
    """Raw mmdit-layout keys produce identical params (incl. the scale/shift
    swap on the final single-modulation heads)."""
    import torch
    cfg = SD3DiTConfig(dim=128, num_layers=3, pos_embed_max_size=16,
                       context_dim=64, pooled_dim=32)
    model = _ref_model(cfg)
    with torch.no_grad():
        model.pos_embedder.pos_embed.normal_()
    sd = model.state_dict()

    P = "model.diffusion_model."
    inv_top = {
        "context_embedder": f"{P}context_embedder",
        "proj_out": f"{P}final_layer.linear",
        "pos_embedder.proj": f"{P}x_embedder.proj",
        "time_embedder.timestep_embedder.0": f"{P}t_embedder.mlp.0",
        "time_embedder.timestep_embedder.2": f"{P}t_embedder.mlp.2",
        "pooled_text_embedder.0": f"{P}y_embedder.mlp.0",
        "pooled_text_embedder.2": f"{P}y_embedder.mlp.2",
    }
    inv_leaf = {
        "norm1_b.linear": "context_block.adaLN_modulation.1",
        "attn.b_to_out": "context_block.attn.proj",
        "attn.b_to_qkv": "context_block.attn.qkv",
        "ff_b.0": "context_block.mlp.fc1", "ff_b.2": "context_block.mlp.fc2",
        "norm1_a.linear": "x_block.adaLN_modulation.1",
        "attn.a_to_out": "x_block.attn.proj",
        "attn.a_to_qkv": "x_block.attn.qkv",
        "ff_a.0": "x_block.mlp.fc1", "ff_a.2": "x_block.mlp.fc2",
    }
    raw = {}
    n_last = cfg.num_layers - 1
    for k, v in sd.items():
        if k == "pos_embedder.pos_embed":
            raw[f"{P}pos_embed"] = v.reshape(1, -1, v.shape[-1])
            continue
        prefix, suffix = k.rsplit(".", 1)
        if prefix in inv_top:
            raw[f"{inv_top[prefix]}.{suffix}"] = v
        elif prefix == "norm_out.linear":
            half = v.shape[0] // 2
            raw[f"{P}final_layer.adaLN_modulation.1.{suffix}"] = torch.cat(
                [v[half:], v[:half]], dim=0)
        elif prefix.startswith("blocks."):
            _, i, rest = prefix.split(".", 2)
            if rest == "norm1_b.linear" and int(i) == n_last:
                half = v.shape[0] // 2
                raw[f"{P}joint_blocks.{i}.context_block.adaLN_modulation.1."
                    f"{suffix}"] = torch.cat([v[half:], v[:half]], dim=0)
            elif rest in inv_leaf:
                raw[f"{P}joint_blocks.{i}.{inv_leaf[rest]}.{suffix}"] = v

    a = convert_sd3_dit(sd, cfg, dtype=jnp.float32)
    b = convert_sd3_dit(raw, cfg, dtype=jnp.float32)
    import jax.tree_util as jtu
    for x, y in zip(jtu.tree_leaves(a), jtu.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)
