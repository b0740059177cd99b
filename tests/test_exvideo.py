"""ExVideo patched-model support (reference configs/model_config.py:197-199,
models/model_manager.py:232-312, examples/ExVideo/): the SVD UNet rebuilt
with trained 128-frame positional tables + reflect-padded positional convs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.svd import (
    temporal_attention_block, positional_id_map)
from video_styler_tpu.models.sd import convert_sd_module
from video_styler_tpu.utils.ckpt import (
    detect_model_kind, apply_state_dict_patch)
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def test_positional_id_map_matches_reference():
    ref = load_ref("models.svd_unet")
    pid = ref.PositionalID()
    for n in (5, 25, 40, 80, 128):
        want = pid(n).numpy()
        got = positional_id_map(n)
        np.testing.assert_array_equal(got, want)


def _ref_block(add_positional_conv):
    import torch
    ref = load_ref("models.svd_unet")
    torch.manual_seed(0)
    blk = ref.TemporalAttentionBlock(2, 16, 32, cross_attention_dim=48,
                                     add_positional_conv=add_positional_conv)
    with torch.no_grad():
        for p in blk.parameters():
            p.data = torch.randn_like(p.data) * 0.05
    return blk.eval()


@pytest.mark.parametrize("patched", [False, True])
def test_temporal_attention_block_parity(patched):
    import torch
    blk = _ref_block(128 if patched else None)
    params = convert_sd_module(blk.state_dict(), dtype=jnp.float32)
    assert ("positional_conv" in params) == patched

    torch.manual_seed(1)
    # T=30 crosses the max_id=25 reflection boundary in patched mode
    x = torch.randn(30, 32, 4, 6)
    text = torch.randn(1, 48)   # the reference repeats (1, C) per pixel
    with torch.no_grad():
        want = blk(x, None, text, [])[0].numpy()
    got = np.asarray(temporal_attention_block(
        params, jnp.asarray(x.numpy()),
        jnp.asarray(text.numpy())[None],    # ours takes (1, L, C)
        num_heads=2))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_patch_detection_and_merge():
    blk_base = _ref_block(None)
    blk_patch = _ref_block(128)
    base_sd = {f"blocks.3.{k}": v for k, v in blk_base.state_dict().items()}
    patch_sd = {f"blocks.3.{k}": v for k, v in blk_patch.state_dict().items()
                if "positional" in k}
    assert detect_model_kind({**patch_sd, "blocks.3.x.mix_factor": 0}) \
        == "svd_unet_exvideo"
    merged = apply_state_dict_patch(base_sd, patch_sd)
    params = convert_sd_module(merged, dtype=jnp.float32)
    assert "positional_conv" in params["blocks"]["3"]
    assert params["blocks"]["3"]["positional_embedding"][
        "embeddings"].shape[0] == 128
