"""Golden parity: our FLUX DiT vs the reference FluxDiT
(/root/reference/diffsynth/models/flux_dit.py).

The reference constructor hard-codes dim 3072 (12B params), so the oracle is
a tiny subclass that rebuilds the module graph with small dims and inherits
the reference forward verbatim.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.flux_dit import (
    FLUX_DIT_TINY, init_flux_dit, convert_flux_dit, flux_dit_forward,
    flux_rope_cos_sin, prepare_image_ids, rename_civitai_flux,
)
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = FLUX_DIT_TINY  # dim 96, 4 heads (head_dim 24, axes 4/10/10), 2+2 blocks


def _tiny_ref_dit():
    import torch
    ref = load_ref("models.flux_dit")

    class TinyFluxDiT(ref.FluxDiT):
        def __init__(self):
            torch.nn.Module.__init__(self)
            d, heads = CFG.dim, CFG.num_heads
            self.pos_embedder = ref.RoPEEmbedding(d, CFG.theta, list(CFG.axes_dim))
            self.time_embedder = ref.TimestepEmbeddings(CFG.time_freq_dim, d)
            self.guidance_embedder = ref.TimestepEmbeddings(CFG.time_freq_dim, d)
            self.pooled_text_embedder = torch.nn.Sequential(
                torch.nn.Linear(CFG.pooled_dim, d), torch.nn.SiLU(),
                torch.nn.Linear(d, d))
            self.context_embedder = torch.nn.Linear(CFG.context_dim, d)
            self.x_embedder = torch.nn.Linear(CFG.in_dim, d)
            self.blocks = torch.nn.ModuleList(
                [ref.FluxJointTransformerBlock(d, heads)
                 for _ in range(CFG.num_joint_blocks)])
            self.single_blocks = torch.nn.ModuleList(
                [ref.FluxSingleTransformerBlock(d, heads)
                 for _ in range(CFG.num_single_blocks)])
            self.final_norm_out = ref.AdaLayerNormContinuous(d)
            self.final_proj_out = torch.nn.Linear(d, CFG.out_dim)
            self.input_dim = CFG.in_dim

    torch.manual_seed(0)
    return TinyFluxDiT().eval()


def test_flux_dit_forward_parity():
    import torch
    model = _tiny_ref_dit()
    params = convert_flux_dit(model.state_dict(), CFG, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, 16)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    ctx = rng.standard_normal((1, 8, CFG.context_dim)).astype(np.float32)
    pooled = rng.standard_normal((1, CFG.pooled_dim)).astype(np.float32)
    g = np.asarray([3.5], np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(ctx), torch.from_numpy(pooled),
                     torch.from_numpy(g),
                     text_ids=torch.zeros(1, 8, 3)).numpy()
    got = np.asarray(flux_dit_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(pooled), jnp.asarray(g)), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flux_rope_parity():
    import torch
    ref = load_ref("models.flux_dit")
    emb = ref.RoPEEmbedding(CFG.dim, CFG.theta, list(CFG.axes_dim))
    ids = np.stack([np.zeros(12), np.arange(12) % 4, np.arange(12) // 4],
                   axis=-1).astype(np.float32)
    want = emb(torch.from_numpy(ids)[None]).numpy()  # (1, 1, S, d/2, 2, 2)
    cos, sin = flux_rope_cos_sin(ids, CFG.axes_dim, CFG.theta)
    np.testing.assert_allclose(cos, want[0, 0, :, :, 0, 0], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sin, want[0, 0, :, :, 1, 0], rtol=1e-6, atol=1e-6)

    # application parity on a random head tensor
    x = np.random.default_rng(1).standard_normal((1, 4, 12, 24)).astype(np.float32)
    xt = torch.from_numpy(x)
    blk = ref.FluxSingleAttention(CFG.dim, CFG.dim, CFG.num_heads, 24)
    want_q, _ = blk.apply_rope(xt, xt, torch.from_numpy(
        np.asarray(emb(torch.from_numpy(ids)[None]))))
    from video_styler_tpu.models.flux_dit import rope_apply_interleaved
    got_q = rope_apply_interleaved(
        jnp.asarray(x.transpose(0, 2, 1, 3)), jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.asarray(got_q).transpose(0, 2, 1, 3),
                               want_q.numpy(), rtol=1e-5, atol=1e-5)


def test_image_ids_parity():
    import torch
    model = _tiny_ref_dit()
    lat = torch.zeros(1, 16, 16, 20)
    want = model.prepare_image_ids(lat).numpy()[0]
    got = prepare_image_ids(0, 8, 10)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_civitai_rename_roundtrip():
    """Raw BFL-layout keys produce the same params as the module layout."""
    import torch
    model = _tiny_ref_dit()
    sd = model.state_dict()

    inv_top = {
        "time_embedder.timestep_embedder.0": "time_in.in_layer",
        "time_embedder.timestep_embedder.2": "time_in.out_layer",
        "guidance_embedder.timestep_embedder.0": "guidance_in.in_layer",
        "guidance_embedder.timestep_embedder.2": "guidance_in.out_layer",
        "pooled_text_embedder.0": "vector_in.in_layer",
        "pooled_text_embedder.2": "vector_in.out_layer",
        "context_embedder": "txt_in",
        "x_embedder": "img_in",
        "final_proj_out": "final_layer.linear",
    }
    inv_joint = {
        "attn.a_to_qkv": "img_attn.qkv", "attn.b_to_qkv": "txt_attn.qkv",
        "attn.a_to_out": "img_attn.proj", "attn.b_to_out": "txt_attn.proj",
        "attn.norm_q_a.weight": "img_attn.norm.query_norm.scale",
        "attn.norm_k_a.weight": "img_attn.norm.key_norm.scale",
        "attn.norm_q_b.weight": "txt_attn.norm.query_norm.scale",
        "attn.norm_k_b.weight": "txt_attn.norm.key_norm.scale",
        "ff_a.0": "img_mlp.0", "ff_a.2": "img_mlp.2",
        "ff_b.0": "txt_mlp.0", "ff_b.2": "txt_mlp.2",
        "norm1_a.linear": "img_mod.lin", "norm1_b.linear": "txt_mod.lin",
    }
    inv_single = {
        "to_qkv_mlp": "linear1", "proj_out": "linear2",
        "norm.linear": "modulation.lin",
        "norm_q_a.weight": "norm.query_norm.scale",
        "norm_k_a.weight": "norm.key_norm.scale",
    }

    raw = {}
    for k, v in sd.items():
        if k.startswith("blocks."):
            _, i, rest = k.split(".", 2)
            for ours, theirs in inv_joint.items():
                if rest == ours:
                    raw[f"double_blocks.{i}.{theirs}"] = v
                    break
                if rest.startswith(ours + "."):
                    raw[f"double_blocks.{i}.{theirs}.{rest.rsplit('.', 1)[1]}"] = v
                    break
        elif k.startswith("single_blocks."):
            _, i, rest = k.split(".", 2)
            for ours, theirs in inv_single.items():
                if rest == ours:
                    raw[f"single_blocks.{i}.{theirs}"] = v
                    break
                if rest.startswith(ours + "."):
                    raw[f"single_blocks.{i}.{theirs}.{rest.rsplit('.', 1)[1]}"] = v
                    break
        elif k.startswith("final_norm_out.linear."):
            leaf = k.rsplit(".", 1)[1]
            half = v.shape[0] // 2
            raw[f"final_layer.adaLN_modulation.1.{leaf}"] = torch.cat(
                [v[half:], v[:half]], dim=0)   # inverse of the scale/shift swap
        else:
            prefix, leaf = k.rsplit(".", 1)
            raw[f"{inv_top[prefix]}.{leaf}"] = v

    a = convert_flux_dit(sd, CFG, dtype=jnp.float32)
    b = convert_flux_dit(raw, CFG, dtype=jnp.float32)
    import jax.tree_util as jtu
    la, lb = jtu.tree_leaves(a), jtu.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)
