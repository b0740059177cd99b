"""Golden parity: StepVideo DiT vs the reference StepVideoModel
(/root/reference/diffsynth/models/stepvideo_dit.py:746-927)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.stepvideo_dit as S
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = S.STEP_VIDEO_TINY


def _tiny_ref():
    import torch
    ref = load_ref("models.stepvideo_dit")
    torch.manual_seed(0)
    model = ref.StepVideoModel(
        num_attention_heads=CFG.num_heads, attention_head_dim=CFG.head_dim,
        in_channels=CFG.in_channels, out_channels=CFG.out_channels,
        num_layers=CFG.num_layers,
        caption_channels=[CFG.caption_dim, CFG.clip_dim]).eval()
    # tiny head_dim needs a matching rope split
    for blk in model.transformer_blocks:
        blk.attn1.rope_ch_split = list(CFG.rope_split)
    return model


def test_step_dit_forward_parity():
    import torch
    model = _tiny_ref()
    params = S.convert_step_video_dit(model.state_dict(), CFG,
                                      dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 8, 8)).astype(np.float32)
    t = np.asarray([0.6], np.float32)
    cap = rng.standard_normal((1, 7, CFG.caption_dim)).astype(np.float32)
    clip = rng.standard_normal((1, 3, CFG.clip_dim)).astype(np.float32)
    mask = torch.ones(1, 10, dtype=torch.long)
    with torch.no_grad():
        want = model(torch.from_numpy(x), torch.from_numpy(cap),
                     torch.from_numpy(clip), torch.from_numpy(t),
                     encoder_attention_mask=mask).numpy()
    got = np.asarray(S.step_video_dit_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cap),
        jnp.asarray(clip), jnp.ones((1, 10), jnp.int32)), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
