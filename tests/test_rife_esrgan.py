"""RIFE IFNet + ESRGAN RRDBNet golden parity vs reference torch modules."""
import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.extensions.rife import (
    ifnet_forward, convert_ifnet, warp, RIFEInterpolater, RIFESmoother,
)
from video_styler_tpu.extensions.esrgan import (
    rrdbnet_forward, convert_rrdbnet, ESRGANUpscaler,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
def test_warp_matches_grid_sample():
    import torch
    ref = load_ref("extensions.RIFE")
    torch.manual_seed(0)
    img = torch.randn(2, 3, 16, 20)
    flow = torch.randn(2, 2, 16, 20) * 2
    want = ref.warp(img, flow, device="cpu").numpy()
    got = np.asarray(warp(jnp.asarray(img.numpy()), jnp.asarray(flow.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@needs_ref
def test_ifnet_parity():
    import torch
    ref = load_ref("extensions.RIFE")
    torch.manual_seed(0)
    model = ref.IFNet().eval()
    params = convert_ifnet(model.state_dict())
    torch.manual_seed(1)
    x = torch.rand(1, 6, 64, 64)
    with torch.no_grad():
        flow_ref, mask_ref, merged_ref = model(x, scale_list=[4, 2, 1])
    flow, mask, merged = ifnet_forward(params, jnp.asarray(x.numpy()),
                                       (4, 2, 1))
    np.testing.assert_allclose(np.asarray(merged[2]), merged_ref[2].numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(flow[2]), flow_ref[2].numpy(),
                               rtol=1e-3, atol=1e-3)


@needs_ref
def test_esrgan_parity():
    import torch
    ref = load_ref("extensions.ESRGAN")
    torch.manual_seed(0)
    model = ref.RRDBNet(num_block=2).eval()
    params = convert_rrdbnet(model.state_dict())
    torch.manual_seed(1)
    x = torch.rand(1, 3, 16, 16)
    with torch.no_grad():
        want = model(x).numpy()
    got = np.asarray(rrdbnet_forward(params, jnp.asarray(x.numpy()),
                                     num_blocks=2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@needs_ref
def test_rife_interpolate_api():
    import torch
    ref = load_ref("extensions.RIFE")
    torch.manual_seed(0)
    model = ref.IFNet().eval()
    params = convert_ifnet(model.state_dict())
    rife = RIFEInterpolater(params)
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8))
              for _ in range(3)]
    out = rife.interpolate(frames)
    assert len(out) == 5          # 3 frames + 2 interpolated
    assert out[0].size == (32, 32)
