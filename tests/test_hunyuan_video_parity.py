"""Golden parity: our HunyuanVideo DiT vs the reference HunyuanVideoDiT
(/root/reference/diffsynth/models/hunyuan_video_dit.py:589-661).

The reference hard-codes 24 heads inside its block modules and a CUDA-device
layer inside IndividualTokenRefinerBlock, so the oracle is a tiny subclass
that rebuilds the module graph with small dims on CPU and inherits the
reference forwards verbatim.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.hunyuan_video_dit import (
    HUNYUAN_VIDEO_TINY, init_hunyuan_video_dit, convert_hunyuan_video_dit,
    hunyuan_video_dit_forward, hunyuan_rope, rename_civitai_hunyuan)
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = HUNYUAN_VIDEO_TINY


def _tiny_ref_dit():
    import torch
    ref = load_ref("models.hunyuan_video_dit")
    d, heads = CFG.hidden_size, CFG.num_heads

    class TinyRefinerBlock(ref.IndividualTokenRefinerBlock):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.num_heads = heads
            self.norm1 = torch.nn.LayerNorm(d, elementwise_affine=True, eps=1e-6)
            self.self_attn_qkv = torch.nn.Linear(d, d * 3)
            self.self_attn_proj = torch.nn.Linear(d, d)
            self.norm2 = torch.nn.LayerNorm(d, elementwise_affine=True, eps=1e-6)
            self.mlp = torch.nn.Sequential(
                torch.nn.Linear(d, d * 4), torch.nn.SiLU(),
                torch.nn.Linear(d * 4, d))
            self.adaLN_modulation = torch.nn.Sequential(
                torch.nn.SiLU(), torch.nn.Linear(d, d * 2))

    class TinyRefiner(ref.SingleTokenRefiner):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.input_embedder = torch.nn.Linear(CFG.text_dim, d, bias=True)
            self.t_embedder = ref.TimestepEmbeddings(CFG.time_freq_dim, d)
            self.c_embedder = torch.nn.Sequential(
                torch.nn.Linear(CFG.text_dim, d), torch.nn.SiLU(),
                torch.nn.Linear(d, d))
            self.blocks = torch.nn.ModuleList(
                [TinyRefinerBlock() for _ in range(CFG.refiner_depth)])

    class TinyHYDiT(ref.HunyuanVideoDiT):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.img_in = ref.PatchEmbed(in_channels=16, embed_dim=d)
            self.txt_in = TinyRefiner()
            self.time_in = ref.TimestepEmbeddings(CFG.time_freq_dim, d)
            self.vector_in = torch.nn.Sequential(
                torch.nn.Linear(CFG.pooled_dim, d), torch.nn.SiLU(),
                torch.nn.Linear(d, d))
            self.guidance_in = ref.TimestepEmbeddings(CFG.time_freq_dim, d)
            self.double_blocks = torch.nn.ModuleList(
                [ref.MMDoubleStreamBlock(d, heads)
                 for _ in range(CFG.num_double_blocks)])
            self.single_blocks = torch.nn.ModuleList(
                [ref.MMSingleStreamBlock(d, heads)
                 for _ in range(CFG.num_single_blocks)])
            self.final_layer = ref.FinalLayer(d)

        def forward(self, x, t, prompt_emb, text_mask, pooled_prompt_emb,
                    freqs_cos, freqs_sin, guidance):
            B, C, T, H, W = x.shape
            vec = self.time_in(t, dtype=torch.float32) \
                + self.vector_in(pooled_prompt_emb)
            vec = vec + self.guidance_in(guidance * 1000, dtype=torch.float32)
            img = self.img_in(x)
            txt = self.txt_in(prompt_emb, t, text_mask)
            for block in self.double_blocks:
                img, txt = block(img, txt, vec, (freqs_cos, freqs_sin),
                                 split_token=CFG.split_token)
            h = torch.concat([img, txt], dim=1)
            for block in self.single_blocks:
                h = block(h, vec, (freqs_cos, freqs_sin),
                          txt_len=CFG.txt_len, split_token=CFG.split_token)
            img = h[:, :-CFG.txt_len]
            img = self.final_layer(img, vec)
            return self.unpatchify(img, T=T, H=H // 2, W=W // 2)

    # FinalLayer defaults to hidden 3072; rebuild at tiny dim
    torch.manual_seed(0)
    model = TinyHYDiT()
    fl = model.final_layer
    fl.norm_final = torch.nn.LayerNorm(d, elementwise_affine=False, eps=1e-6)
    fl.linear = torch.nn.Linear(d, 1 * 2 * 2 * 16)
    fl.adaLN_modulation = torch.nn.Sequential(torch.nn.SiLU(),
                                              torch.nn.Linear(d, 2 * d))
    return model.eval()


def test_hunyuan_rope_parity():
    import torch
    ref = load_ref("models.hunyuan_video_dit")

    class _R(ref.HunyuanVideoDiT):
        def __init__(self):
            torch.nn.Module.__init__(self)
    lat = torch.zeros(1, 16, 3, 8, 12)
    # the reference rope function is module-level via prepare_freqs
    want_cos, want_sin = ref.HunyuanVideoRope(lat)
    # reference uses rope dims [16,56,56] (sum 128); compare against a
    # same-dims call of our builder, undoing the repeat_interleave(2)
    import video_styler_tpu.models.hunyuan_video_dit as H
    import dataclasses
    cfg = dataclasses.replace(H.HUNYUAN_VIDEO, rope_dims=(16, 56, 56))
    cos, sin = H.hunyuan_rope(cfg, 3, 4, 6)
    np.testing.assert_allclose(cos, want_cos.numpy()[:, 0::2], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(sin, want_sin.numpy()[:, 0::2], rtol=1e-5,
                               atol=1e-5)


def test_hunyuan_dit_forward_parity():
    import torch
    model = _tiny_ref_dit()
    params = convert_hunyuan_video_dit(model.state_dict(), CFG,
                                       dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 3, 8, 8)).astype(np.float32)
    t = np.asarray([700.0], np.float32)
    prompt = rng.standard_normal((1, CFG.txt_len, CFG.text_dim)).astype(np.float32)
    mask = np.zeros((1, CFG.txt_len), np.int64)
    mask[:, :5] = 1
    pooled = rng.standard_normal((1, CFG.pooled_dim)).astype(np.float32)
    g = np.asarray([6.0], np.float32)

    cos, sin = hunyuan_rope(CFG, 3, 4, 4)
    cos_t = torch.from_numpy(np.repeat(cos, 2, axis=1))
    sin_t = torch.from_numpy(np.repeat(sin, 2, axis=1))
    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(prompt), torch.from_numpy(mask),
                     torch.from_numpy(pooled), cos_t, sin_t,
                     torch.from_numpy(g)).numpy()
    got = np.asarray(hunyuan_video_dit_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(prompt),
        jnp.asarray(mask), jnp.asarray(pooled), jnp.asarray(g)), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_hunyuan_civitai_rename():
    """Raw civitai layout (img_mod/linear1 fused keys) converts to the same
    params as the module layout."""
    import torch
    model = _tiny_ref_dit()
    sd = model.state_dict()
    d = CFG.hidden_size
    raw = {}
    inv_direct = {
        "img_in.proj": "img_in.proj",
        "time_in.timestep_embedder.0": "time_in.mlp.0",
        "time_in.timestep_embedder.2": "time_in.mlp.2",
        "vector_in.0": "vector_in.in_layer",
        "vector_in.2": "vector_in.out_layer",
        "guidance_in.timestep_embedder.0": "guidance_in.mlp.0",
        "guidance_in.timestep_embedder.2": "guidance_in.mlp.2",
        "txt_in.input_embedder": "txt_in.input_embedder",
        "txt_in.t_embedder.timestep_embedder.0": "txt_in.t_embedder.mlp.0",
        "txt_in.t_embedder.timestep_embedder.2": "txt_in.t_embedder.mlp.2",
        "txt_in.c_embedder.0": "txt_in.c_embedder.linear_1",
        "txt_in.c_embedder.2": "txt_in.c_embedder.linear_2",
        "final_layer.linear": "final_layer.linear",
        "final_layer.adaLN_modulation.1": "final_layer.adaLN_modulation.1",
    }
    inv_dbl = {
        "component_a.mod.linear": "img_mod.linear",
        "component_a.to_qkv": "img_attn_qkv",
        "component_a.norm_q": "img_attn_q_norm",
        "component_a.norm_k": "img_attn_k_norm",
        "component_a.to_out": "img_attn_proj",
        "component_a.ff.0": "img_mlp.fc1", "component_a.ff.2": "img_mlp.fc2",
        "component_b.mod.linear": "txt_mod.linear",
        "component_b.to_qkv": "txt_attn_qkv",
        "component_b.norm_q": "txt_attn_q_norm",
        "component_b.norm_k": "txt_attn_k_norm",
        "component_b.to_out": "txt_attn_proj",
        "component_b.ff.0": "txt_mlp.fc1", "component_b.ff.2": "txt_mlp.fc2",
    }
    inv_txt = {"norm1": "norm1", "self_attn_qkv": "self_attn_qkv",
               "self_attn_proj": "self_attn_proj", "norm2": "norm2",
               "mlp.0": "mlp.fc1", "mlp.2": "mlp.fc2",
               "adaLN_modulation.1": "adaLN_modulation.1"}

    # fuse single-block to_qkv/ff back into linear1/linear2
    singles = {}
    for k, v in sd.items():
        prefix, leaf = k.rsplit(".", 1)
        if prefix in inv_direct:
            raw[f"{inv_direct[prefix]}.{leaf}"] = v
        elif k.startswith("double_blocks."):
            _, i, rest = k.split(".", 2)
            mid = rest.rsplit(".", 1)[0]
            raw[f"double_blocks.{i}.{inv_dbl[mid]}.{leaf}"] = v
        elif k.startswith("txt_in.blocks."):
            _, _, i, rest = k.split(".", 3)
            mid = rest.rsplit(".", 1)[0]
            raw[f"txt_in.individual_token_refiner.blocks.{i}."
                f"{inv_txt[mid]}.{leaf}"] = v
        elif k.startswith("single_blocks."):
            _, i, rest = k.split(".", 2)
            singles.setdefault(i, {})[rest] = v
    for i, s in singles.items():
        pre = f"single_blocks.{i}"
        raw[f"{pre}.linear1.weight"] = torch.cat(
            [s["to_qkv.weight"], s["ff.0.weight"]], dim=0)
        raw[f"{pre}.linear1.bias"] = torch.cat(
            [s["to_qkv.bias"], s["ff.0.bias"]], dim=0)
        raw[f"{pre}.linear2.weight"] = torch.cat(
            [s["to_out.weight"], s["ff.2.weight"]], dim=-1)
        raw[f"{pre}.linear2.bias"] = s["to_out.bias"]
        raw[f"{pre}.q_norm.weight"] = s["norm_q.weight"]
        raw[f"{pre}.k_norm.weight"] = s["norm_k.weight"]
        raw[f"{pre}.modulation.linear.weight"] = s["mod.linear.weight"]
        raw[f"{pre}.modulation.linear.bias"] = s["mod.linear.bias"]

    a = convert_hunyuan_video_dit(sd, CFG, dtype=jnp.float32)
    b = convert_hunyuan_video_dit(raw, CFG, dtype=jnp.float32)
    import jax.tree_util as jtu
    la, lb = jtu.tree_leaves(a), jtu.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=0)
