"""Primitive op parity: norms, GELU, sinusoidal embedding, 3D RoPE."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.ops.basic import (
    rms_norm, layer_norm, gelu_tanh, sinusoidal_embedding_1d, t5_layer_norm,
)
from video_styler_tpu.ops.rope import precompute_freqs_3d, assemble_freqs_grid, rope_apply
from video_styler_tpu.ops.attention import sdpa
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
def test_rms_norm_matches_reference():
    import torch
    ref = load_ref("models.wan_video_dit")
    m = ref.RMSNorm(32, eps=1e-6)
    with torch.no_grad():
        m.weight.copy_(torch.rand(32) + 0.5)
    x = torch.randn(2, 5, 32)
    want = m(x).detach().numpy()
    got = rms_norm({"scale": jnp.asarray(m.weight.detach().numpy())},
                   jnp.asarray(x.numpy()), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@needs_ref
def test_layer_norm_matches_torch():
    import torch
    x = torch.randn(2, 7, 48)
    m = torch.nn.LayerNorm(48, eps=1e-6)
    with torch.no_grad():
        m.weight.copy_(torch.rand(48) + 0.5)
        m.bias.copy_(torch.randn(48) * 0.1)
    want = m(x).detach().numpy()
    got = layer_norm({"scale": jnp.asarray(m.weight.detach().numpy()),
                      "bias": jnp.asarray(m.bias.detach().numpy())},
                     jnp.asarray(x.numpy()), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@needs_ref
def test_gelu_tanh_matches_torch():
    import torch
    x = torch.randn(100)
    want = torch.nn.functional.gelu(x, approximate="tanh").numpy()
    got = np.asarray(gelu_tanh(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@needs_ref
def test_t5_layer_norm_matches_reference():
    import torch
    ref = load_ref("models.wan_video_text_encoder")
    m = ref.T5LayerNorm(64)
    with torch.no_grad():
        m.weight.copy_(torch.rand(64) + 0.5)
    x = torch.randn(2, 3, 64)
    want = m(x).detach().numpy()
    got = t5_layer_norm({"scale": jnp.asarray(m.weight.detach().numpy())},
                        jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@needs_ref
def test_sinusoidal_embedding_matches_reference():
    import torch
    ref = load_ref("models.wan_video_dit")
    pos = torch.tensor([0.0, 1.0, 500.0, 999.0])
    want = ref.sinusoidal_embedding_1d(256, pos).numpy()
    got = np.asarray(sinusoidal_embedding_1d(256, jnp.asarray(pos.numpy())))
    # fp32 sin/cos argument reduction at t~1000 costs ~3e-5 absolute; the
    # reference computes in fp64. Well below bf16 activation resolution.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_rope_3d_matches_reference():
    import torch
    ref = load_ref("models.wan_video_dit")
    head_dim, num_heads = 96, 2
    f, h, w = 3, 4, 5
    s = f * h * w
    freqs_ref = ref.precompute_freqs_cis_3d(head_dim)
    freqs = torch.cat([
        freqs_ref[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        freqs_ref[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        freqs_ref[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(s, 1, -1)

    x = torch.randn(2, s, num_heads * head_dim)
    want = ref.rope_apply(x, freqs, num_heads).numpy()

    cos, sin = assemble_freqs_grid(head_dim, f, h, w)
    xj = jnp.asarray(x.numpy()).reshape(2, s, num_heads, head_dim)
    got = np.asarray(rope_apply(xj, cos, sin)).reshape(2, s, num_heads * head_dim)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_ref
def test_rope_custom_indices_matches_reference():
    import torch
    ref = load_ref("models.wan_video_dit")
    head_dim = 96
    h, w = 2, 3
    rope_indices = [0, 7, 19]
    f = len(rope_indices)
    freqs_ref = ref.precompute_freqs_cis_3d(head_dim)
    idx = torch.tensor(rope_indices)
    freqs = torch.cat([
        freqs_ref[0][idx].view(f, 1, 1, -1).expand(f, h, w, -1),
        freqs_ref[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        freqs_ref[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)
    x = torch.randn(1, f * h * w, head_dim)
    want = ref.rope_apply(x, freqs, 1).numpy()

    cos, sin = assemble_freqs_grid(head_dim, f, h, w, np.array(rope_indices))
    got = np.asarray(rope_apply(jnp.asarray(x.numpy()).reshape(1, -1, 1, head_dim),
                                cos, sin)).reshape(1, -1, head_dim)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_ref
def test_sdpa_matches_torch():
    import torch
    q = torch.randn(2, 10, 4, 16)
    k = torch.randn(2, 12, 4, 16)
    v = torch.randn(2, 12, 4, 16)
    want = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
    ).transpose(1, 2).numpy()
    got = np.asarray(sdpa(jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
                          jnp.asarray(v.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
