"""Golden parity: tiny T5 encoder vs the reference WanTextEncoder."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.t5 import (
    T5Config, t5_encode, convert_t5, relative_position_buckets,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")

TINY = dict(vocab=128, dim=64, dim_attn=64, dim_ffn=128, num_heads=4,
            num_layers=2, num_buckets=8, shared_pos=False, dropout=0.0)


@needs_ref
def test_relative_buckets_match_reference():
    import torch
    ref = load_ref("models.wan_video_text_encoder")
    emb = ref.T5RelativeEmbedding(32, 4, bidirectional=True)
    rel_pos = torch.arange(12)[None, :] - torch.arange(12)[:, None]
    want = emb._relative_position_bucket(rel_pos).numpy()
    got = relative_position_buckets(12, 12, 32)
    np.testing.assert_array_equal(got, want)


@needs_ref
@pytest.mark.parametrize("with_mask", [False, True])
def test_tiny_t5_parity(with_mask):
    import torch
    ref = load_ref("models.wan_video_text_encoder")
    torch.manual_seed(0)
    model = ref.WanTextEncoder(**TINY).eval()

    cfg = T5Config(**{k: v for k, v in TINY.items() if k != "dropout"})
    params = convert_t5(model.state_dict(), cfg, dtype=jnp.float32)

    torch.manual_seed(1)
    ids = torch.randint(0, 128, (2, 10))
    mask = None
    if with_mask:
        mask = torch.ones(2, 10, dtype=torch.long)
        mask[0, 6:] = 0
        mask[1, 3:] = 0
    with torch.no_grad():
        want = model(ids, mask).numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids.numpy()),
                               None if mask is None else jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
