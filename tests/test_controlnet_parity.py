"""Golden parity: SD/SDXL ControlNets, IP-Adapters, AnimateDiff motion
modules vs the reference torch modules
(/root/reference/diffsynth/models/sd_controlnet.py, sdxl_controlnet.py,
sd_ipadapter.py, sdxl_ipadapter.py, sd_motion.py, sdxl_motion.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def test_sd_controlnet_parity():
    import torch
    import video_styler_tpu.models.controlnet as C
    ref = load_ref("models.sd_controlnet")
    torch.manual_seed(0)
    model = ref.SDControlNet().eval()
    params = C.convert_controlnet(model.state_dict())
    rng = np.random.default_rng(0)
    sample = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    cond = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    text = rng.standard_normal((1, 7, 768)).astype(np.float32)
    t = torch.tensor((500.0,))
    with torch.no_grad():
        want = model(torch.from_numpy(sample), t, torch.from_numpy(text),
                     torch.from_numpy(cond))
    got = C.sd_controlnet_forward(params, jnp.asarray(sample),
                                  jnp.asarray([500.0]), jnp.asarray(text),
                                  jnp.asarray(cond))
    assert len(got) == len(want) == 13
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32), w.numpy(),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_sdxl_controlnet_union_parity():
    import torch
    import video_styler_tpu.models.controlnet as C
    ref = load_ref("models.sdxl_controlnet")
    torch.manual_seed(0)
    model = ref.SDXLControlNetUnion().eval()
    params = C.convert_controlnet(model.state_dict())
    rng = np.random.default_rng(1)
    sample = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    cond = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    text = rng.standard_normal((1, 7, 2048)).astype(np.float32)
    pooled = rng.standard_normal((1, 1280)).astype(np.float32)
    add_time_id = np.asarray([128, 128, 0, 0, 128, 128], np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(sample), torch.tensor((500.0,)),
                     torch.from_numpy(text), torch.from_numpy(cond),
                     "canny", torch.from_numpy(add_time_id),
                     torch.from_numpy(pooled))
    got = C.sdxl_controlnet_union_forward(
        params, jnp.asarray(sample), jnp.asarray([500.0]), jnp.asarray(text),
        jnp.asarray(cond), "canny", add_time_id, jnp.asarray(pooled))
    assert len(got) == len(want) == 10
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32), w.numpy(),
                                   rtol=3e-3, atol=3e-3)


def test_sd_ipadapter_parity():
    import torch
    import video_styler_tpu.models.ipadapter as I
    ref = load_ref("models.sd_ipadapter")
    torch.manual_seed(0)
    model = ref.SDIpAdapter().eval()
    params = I.convert_ipadapter(model.state_dict())
    emb = np.random.default_rng(2).standard_normal((1, 1024)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(emb), scale=0.7)
    got = I.ipadapter_kwargs(params, jnp.asarray(emb), scale=0.7, xl=False)
    assert set(got) == set(want)
    for bid in want:
        for tid in want[bid]:
            gk, gv, gs = got[bid][tid]
            np.testing.assert_allclose(np.asarray(gk, np.float32),
                                       want[bid][tid]["ip_k"].numpy(),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(gv, np.float32),
                                       want[bid][tid]["ip_v"].numpy(),
                                       rtol=2e-4, atol=2e-4)
            assert gs == 0.7


def test_sd_motion_block_parity():
    import torch
    import video_styler_tpu.models.motion as M
    ref = load_ref("models.sd_motion")
    torch.manual_seed(0)
    block = ref.TemporalBlock(8, 40, 320, eps=1e-6).eval()
    with torch.no_grad():
        for tb in block.transformer_blocks:
            tb.pe1.normal_()
            tb.pe2.normal_()
    params = M.convert_motion_model(block.state_dict())
    x = np.random.default_rng(3).standard_normal((4, 320, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want, _, _, _ = block(torch.from_numpy(x), None, None, None,
                              batch_size=1)
    got = M.temporal_block(params, jnp.asarray(x), num_heads=8)
    np.testing.assert_allclose(np.asarray(got, np.float32), want.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_unet_hooks_change_output():
    """ControlNet residuals, IP-Adapter kv, and motion modules all alter the
    SD UNet output through the lets_dance-equivalent hooks."""
    import torch
    from video_styler_tpu.models.sd import sd_unet_forward, convert_sd_module
    ref = load_ref("models.sd_unet")
    torch.manual_seed(0)
    unet = ref.SDUNet().eval()
    params = convert_sd_module(unet.state_dict())
    rng = np.random.default_rng(4)
    sample = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 7, 768)), jnp.float32)
    t = jnp.asarray([500.0])

    base = sd_unet_forward(params, sample, t, text)

    # 13 zero-like controlnet residuals with a small constant
    shapes = ([(1, 320, 8, 8)] * 3 + [(1, 320, 4, 4)]
              + [(1, 640, 4, 4)] * 2 + [(1, 640, 2, 2)]
              + [(1, 1280, 2, 2)] * 2 + [(1, 1280, 1, 1)] * 4)
    cn = [jnp.full(s, 0.1, jnp.float32) for s in shapes]
    with_cn = sd_unet_forward(params, sample, t, text,
                              controlnet_res_stack=cn)
    assert float(jnp.abs(with_cn - base).mean()) > 1e-6

    ip_k = jnp.asarray(rng.standard_normal((1, 4, 320)), jnp.float32)
    ip_v = jnp.asarray(rng.standard_normal((1, 4, 320)), jnp.float32)
    with_ip = sd_unet_forward(params, sample, t, text,
                              ipadapter_kwargs_list={1: {0: (ip_k, ip_v, 1.0)}})
    assert float(jnp.abs(with_ip - base).mean()) > 1e-6
