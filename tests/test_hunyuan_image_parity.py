"""Golden parity: HunyuanDiT image model vs the reference
(/root/reference/diffsynth/models/hunyuan_dit.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.hunyuan_image_dit as H
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = H.HUNYUAN_DIT_TINY


def _tiny_ref_dit():
    import torch
    ref = load_ref("models.hunyuan_dit")

    class TinyHunyuanDiT(ref.HunyuanDiT):
        def __init__(self):
            torch.nn.Module.__init__(self)
            d, td, t5d = CFG.hidden_dim, CFG.text_dim, CFG.t5_dim
            self.text_emb_padding = torch.nn.Parameter(
                torch.randn(CFG.text_length + CFG.t5_length, td))
            self.t5_embedder = torch.nn.Sequential(
                torch.nn.Linear(t5d, t5d * 4), ref.FP32_SiLU(),
                torch.nn.Linear(t5d * 4, td))
            self.t5_pooler = ref.AttentionPool(CFG.t5_length, t5d,
                                               num_heads=8,
                                               output_dim=CFG.pooled_dim)
            self.style_embedder = torch.nn.Parameter(torch.randn(d))
            self.patch_embedder = ref.PatchEmbed(in_chans=CFG.in_channels,
                                                 embed_dim=d)
            self.timestep_embedder = ref.TimestepEmbedder(hidden_size=d)
            self.extra_embedder = torch.nn.Sequential(
                torch.nn.Linear(256 * 6 + CFG.pooled_dim + d, d * 4),
                ref.FP32_SiLU(), torch.nn.Linear(d * 4, d))
            self.num_layers_down = CFG.num_layers_down
            self.num_layers_up = CFG.num_layers_up
            self.blocks = torch.nn.ModuleList(
                [ref.HunyuanDiTBlock(d, d, CFG.num_heads, CFG.mlp_ratio, td,
                                     skip_connection=False)
                 for _ in range(CFG.num_layers_down)]
                + [ref.HunyuanDiTBlock(d, d, CFG.num_heads, CFG.mlp_ratio, td,
                                       skip_connection=True)
                   for _ in range(CFG.num_layers_up)])
            self.final_layer = ref.HunyuanDiTFinalLayer(
                d, d, CFG.patch_size, CFG.out_channels)
            self.out_channels = CFG.out_channels

    torch.manual_seed(0)
    return TinyHunyuanDiT().eval()


def _ref_rope(height, width):
    """ImageSizeManager.calc_rope with tiny base_size."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "hi_pipe", "/root/reference/diffsynth/pipelines/hunyuan_image.py")
    # the pipeline module imports heavy deps; lift just ImageSizeManager
    import torch

    class M:
        pass
    src = open("/root/reference/diffsynth/pipelines/hunyuan_image.py").read()
    ns = {"np": np, "torch": torch}
    start = src.index("class ImageSizeManager")
    end = src.index("class HunyuanDiTImagePipeline")
    exec(src[start:end], ns)
    mgr = ns["ImageSizeManager"]()
    th, tw = height // CFG.patch_size, width // CFG.patch_size
    start_, stop = mgr.get_fill_resize_and_crop((th, tw), CFG.base_size)
    return mgr.get_2d_rotary_pos_embed(CFG.head_dim, start_, stop, (th, tw))


def test_hunyuan_image_rope_parity():
    want_cos, want_sin = _ref_rope(8, 12)
    cos, sin = H.hunyuan_image_rope(CFG, 8, 12)
    np.testing.assert_allclose(cos, want_cos.numpy()[:, 0::2], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(sin, want_sin.numpy()[:, 0::2], rtol=1e-5,
                               atol=1e-6)


def test_hunyuan_image_dit_forward_parity():
    import torch
    model = _tiny_ref_dit()
    params = H.convert_hunyuan_image_dit(model.state_dict(), CFG,
                                         dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 8, 12)).astype(np.float32)
    text = rng.standard_normal((1, CFG.text_length, CFG.text_dim)
                               ).astype(np.float32)
    t5 = rng.standard_normal((1, CFG.t5_length, CFG.t5_dim)).astype(np.float32)
    mask = np.ones((1, CFG.text_length), np.int64)
    mask[0, 4:] = 0
    mask5 = np.ones((1, CFG.t5_length), np.int64)
    mask5[0, 6:] = 0
    t = np.asarray([500.0], np.float32)
    size = np.asarray([[96.0, 64.0, 96.0, 64.0, 0.0, 0.0]], np.float32)
    cos, sin = _ref_rope(8, 12)
    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(text),
                     torch.from_numpy(t5), torch.from_numpy(mask),
                     torch.from_numpy(mask5), torch.from_numpy(t),
                     torch.from_numpy(size), (cos, sin)).numpy()
    got = np.asarray(H.hunyuan_image_dit_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(text), jnp.asarray(t5),
        jnp.asarray(mask), jnp.asarray(mask5), jnp.asarray(t),
        jnp.asarray(size)), np.float32)
    assert got.shape == want.shape == (1, 4, 8, 12)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
