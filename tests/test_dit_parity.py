"""Golden parity: tiny Wan DiT (and VACE branch) vs the reference torch model.

Builds a small reference WanModel with random weights, converts its state
dict through utils/convert.py (the real checkpoint path), and compares
forward outputs in float32.

Note: the reference `WanModel.forward` itself is dead code (its
`x, (f, h, w) = self.patchify(x)` unpack crashes); the executed path in the
reference is `model_fn_wan_video` (pipelines/wan_video_new.py:1260-1468),
which we replicate here as the golden computation.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_dit import WanDiTConfig, wan_dit_forward
from video_styler_tpu.models.wan_vace import VaceConfig
from video_styler_tpu.utils.convert import convert_wan_dit, convert_vace
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")

TINY = dict(dim=96, in_dim=16, ffn_dim=192, out_dim=16, text_dim=64,
            freq_dim=32, eps=1e-6, patch_size=(1, 2, 2), num_heads=2,
            num_layers=2)


def ref_dit_forward(model, x, t, ctx, clip_feature=None, y=None,
                    rope_indices=None, vace_model=None, vace_context=None,
                    vace_scale=1.0):
    """Reference golden forward == model_fn_wan_video trunk semantics."""
    import torch
    from einops import rearrange
    ref = load_ref("models.wan_video_dit")
    with torch.no_grad():
        te = model.time_embedding(ref.sinusoidal_embedding_1d(model.freq_dim, t))
        t_mod = model.time_projection(te).unflatten(1, (6, model.dim))
        context = model.text_embedding(ctx)
        if model.has_image_input:
            x = torch.cat([x, y], dim=1)
            clip_emb = model.img_emb(clip_feature)
            context = torch.cat([clip_emb, context], dim=1)
        xt = model.patch_embedding(x)
        f, h, w = xt.shape[2:]
        xt = rearrange(xt, "b c f h w -> b (f h w) c")
        if rope_indices is not None:
            fi = rope_indices
            freqs = torch.cat([
                model.freqs[0][fi].view(len(fi), 1, 1, -1).expand(len(fi), h, w, -1),
                model.freqs[1][:h].view(1, h, 1, -1).expand(len(fi), h, w, -1),
                model.freqs[2][:w].view(1, 1, w, -1).expand(len(fi), h, w, -1),
            ], dim=-1).reshape(len(fi) * h * w, 1, -1)
        else:
            freqs = torch.cat([
                model.freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
                model.freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
                model.freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
            ], dim=-1).reshape(f * h * w, 1, -1)
        hints = None
        if vace_model is not None:
            hints = vace_model(xt, vace_context, context, t_mod, freqs)
        for block_id, block in enumerate(model.blocks):
            xt = block(xt, context, t_mod, freqs)
            if hints is not None and block_id in vace_model.vace_layers_mapping:
                xt = xt + hints[vace_model.vace_layers_mapping[block_id]] * vace_scale
        xt = model.head(xt, te)
        return model.unpatchify(xt, (f, h, w)).numpy()


def _build_ref_dit(has_image_input=False, **overrides):
    import torch
    ref = load_ref("models.wan_video_dit")
    torch.manual_seed(0)
    return ref.WanModel(has_image_input=has_image_input,
                        **dict(TINY, **overrides)).eval()


@needs_ref
def test_tiny_dit_forward_parity():
    import torch
    model = _build_ref_dit()
    cfg = WanDiTConfig(has_image_input=False, **TINY)
    params = convert_wan_dit(model.state_dict(), cfg, dtype=jnp.float32)

    torch.manual_seed(1)
    x = torch.randn(1, 16, 4, 8, 8)
    t = torch.tensor([600.0])
    ctx = torch.randn(1, 12, 64)
    want = ref_dit_forward(model, x, t, ctx)
    got = wan_dit_forward(params, cfg, jnp.asarray(x.numpy()),
                          jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


@needs_ref
def test_tiny_dit_rope_indices_parity():
    import torch
    model = _build_ref_dit()
    cfg = WanDiTConfig(has_image_input=False, **TINY)
    params = convert_wan_dit(model.state_dict(), cfg, dtype=jnp.float32)

    torch.manual_seed(2)
    x = torch.randn(1, 16, 5, 8, 8)
    t = torch.tensor([300.0])
    ctx = torch.randn(1, 12, 64)
    want = ref_dit_forward(model, x, t, ctx, rope_indices=torch.tensor([0, 1, 2, 0, 2]))
    got = wan_dit_forward(params, cfg, jnp.asarray(x.numpy()),
                          jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
                          rope_indices=np.array([0, 1, 2, 0, 2]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


@needs_ref
def test_tiny_dit_image_input_parity():
    import torch
    model = _build_ref_dit(has_image_input=True, in_dim=32)
    cfg = WanDiTConfig(has_image_input=True, **dict(TINY, in_dim=32))
    params = convert_wan_dit(model.state_dict(), cfg, dtype=jnp.float32)

    torch.manual_seed(3)
    x = torch.randn(1, 16, 3, 8, 8)
    y = torch.randn(1, 16, 3, 8, 8)
    t = torch.tensor([100.0])
    ctx = torch.randn(1, 12, 64)
    clip_feat = torch.randn(1, 257, 1280)
    want = ref_dit_forward(model, x, t, ctx, clip_feature=clip_feat, y=y)
    got = wan_dit_forward(params, cfg, jnp.asarray(x.numpy()),
                          jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
                          clip_feature=jnp.asarray(clip_feat.numpy()),
                          y=jnp.asarray(y.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=5e-4)


@needs_ref
def test_tiny_vace_parity():
    import torch
    ref_vace_mod = load_ref("models.wan_video_vace")
    model = _build_ref_dit()
    vace_layers = (0, 1)
    torch.manual_seed(10)
    vace_model = ref_vace_mod.VaceWanModel(
        vace_layers=vace_layers, vace_in_dim=96, patch_size=(1, 2, 2),
        has_image_input=False, dim=TINY["dim"], num_heads=TINY["num_heads"],
        ffn_dim=TINY["ffn_dim"], eps=1e-6).eval()

    cfg = WanDiTConfig(has_image_input=False, **TINY)
    vcfg = VaceConfig(vace_layers=vace_layers, vace_in_dim=96, dim=TINY["dim"],
                      num_heads=TINY["num_heads"], ffn_dim=TINY["ffn_dim"])
    params = convert_wan_dit(model.state_dict(), cfg, dtype=jnp.float32)
    vace_params = convert_vace(vace_model.state_dict(), vcfg, dtype=jnp.float32)

    torch.manual_seed(4)
    x = torch.randn(1, 16, 3, 8, 8)
    vctx = torch.randn(1, 96, 3, 8, 8)
    t = torch.tensor([500.0])
    ctx = torch.randn(1, 12, 64)
    want = ref_dit_forward(model, x, t, ctx, vace_model=vace_model,
                           vace_context=vctx, vace_scale=0.7)
    got = wan_dit_forward(params, cfg, jnp.asarray(x.numpy()),
                          jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
                          vace_params=vace_params, vace_cfg=vcfg,
                          vace_context=jnp.asarray(vctx.numpy()),
                          vace_scale=0.7)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=5e-4)
