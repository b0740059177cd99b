"""Flash attention: interpret-mode kernel parity + chunked fallback parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.ops.attention import sdpa
from video_styler_tpu.ops.flash_attention import (
    chunked_attention, _flash_fwd_3d, flash_attention,
)


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("sq,sk", [(128, 128), (200, 200), (256, 64), (300, 512)])
def test_chunked_matches_sdpa(sq, sk):
    q = _rand(0, (2, sq, 4, 32))
    k = _rand(1, (2, sk, 4, 32))
    v = _rand(2, (2, sk, 4, 32))
    want = np.asarray(sdpa(q, k, v))
    b, _, n, d = q.shape
    q3 = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    got = chunked_attention(q3, k3, v3, 1.0 / np.sqrt(d), block_k=128)
    got = np.asarray(got.reshape(b, n, sq, d).transpose(0, 2, 1, 3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_chunked_gradients_match_sdpa():
    q = _rand(0, (1, 64, 2, 16))
    k = _rand(1, (1, 80, 2, 16))
    v = _rand(2, (1, 80, 2, 16))
    scale = 1.0 / np.sqrt(16)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(sdpa(q, k, v)))

    def loss_chunked(q, k, v):
        b, sq, n, d = q.shape
        q3 = q.transpose(0, 2, 1, 3).reshape(-1, sq, d)
        k3 = k.transpose(0, 2, 1, 3).reshape(-1, k.shape[1], d)
        v3 = v.transpose(0, 2, 1, 3).reshape(-1, v.shape[1], d)
        out = chunked_attention(q3, k3, v3, scale, block_k=32)
        return jnp.sum(jnp.square(out))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520)])
def test_pallas_kernel_interpret_mode(sq, sk, monkeypatch):
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    from jax.experimental import pallas as pl
    import video_styler_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp_call)
    q = _rand(0, (2, sq, 32))
    k = _rand(1, (2, sk, 32))
    v = _rand(2, (2, sk, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_3d(q, k, v, scale, block_q=128, block_k=128))
    want = np.asarray(chunked_attention(q, k, v, scale, block_k=128))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520)])
def test_pallas_int8_kernel_interpret_mode(sq, sk, monkeypatch):
    """SageAttention-style int8 kernel vs exact attention: K mean-smoothing
    + per-row scales keep cosine similarity ~1 at realistic magnitudes."""
    from jax.experimental import pallas as pl
    import video_styler_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp_call)
    q = _rand(0, (2, sq, 32))
    k = _rand(1, (2, sk, 32)) + 0.7     # K mean offset: smoothing must absorb
    v = _rand(2, (2, sk, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_3d_int8(q, k, v, scale, block_q=128,
                                           block_k=128), np.float32)
    want = np.asarray(chunked_attention(q, k, v, scale, block_k=128),
                      np.float32)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos
    np.testing.assert_allclose(got, want, rtol=0.2, atol=0.05)


def test_int8_smoothing_invariance():
    """The dropped q . k_mean term is per-row constant: adding a large
    constant channel offset to K must not change int8 attention output
    beyond quantization noise."""
    import video_styler_tpu.ops.flash_attention as fa
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    import unittest.mock as mock
    with mock.patch.object(fa.pl, "pallas_call", interp_call):
        q = _rand(0, (1, 128, 32))
        k = _rand(1, (1, 128, 32))
        v = _rand(2, (1, 128, 32))
        scale = 1.0 / np.sqrt(32)
        a = np.asarray(fa._flash_fwd_3d_int8(q, k, v, scale, 128, 128),
                       np.float32)
        b = np.asarray(fa._flash_fwd_3d_int8(q, k + 3.0, v, scale, 128, 128),
                       np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.02)


def _interp(monkeypatch):
    from jax.experimental import pallas as pl
    import video_styler_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp_call)
    return fa


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520)])
def test_pallas_4d_kernel_interpret_mode(sq, sk, monkeypatch):
    """Layout-native (B, S, N, D) kernel == sdpa, including in-kernel
    softmax-scale folding and S padding."""
    fa = _interp(monkeypatch)
    q = _rand(0, (2, sq, 3, 32))
    k = _rand(1, (2, sk, 3, 32))
    v = _rand(2, (2, sk, 3, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_4d(q, k, v, scale, block_q=128,
                                      block_k=128))
    want = np.asarray(sdpa(q, k, v, scale=scale))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flash_attention_4d_gradients(monkeypatch):
    """custom_vjp of the 4-D entry: grads match sdpa autodiff."""
    fa = _interp(monkeypatch)
    q = _rand(0, (1, 128, 2, 32))
    k = _rand(1, (1, 160, 2, 32))
    v = _rand(2, (1, 160, 2, 32))

    g_ref = jax.grad(lambda q, k, v: jnp.sum(jnp.square(sdpa(q, k, v))),
                     argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(
        lambda q, k, v: jnp.sum(jnp.square(fa.flash_attention(q, k, v))),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("capped", [True, False])
@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520)])
def test_pallas_int8_4d_kernel_interpret_mode(sq, sk, capped, monkeypatch):
    fa = _interp(monkeypatch)
    q = _rand(0, (2, sq, 3, 32))
    k = _rand(1, (2, sk, 3, 32)) + 0.7   # K mean offset: smoothing absorbs
    v = _rand(2, (2, sk, 3, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_4d_int8(q, k, v, scale, block_q=128,
                                           block_k=128, capped=capped),
                     np.float32)
    want = np.asarray(sdpa(q, k, v, scale=scale), np.float32)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos
    np.testing.assert_allclose(got, want, rtol=0.2, atol=0.05)


def test_pallas_int8_4d_capped_matches_online(monkeypatch):
    """The capped int8 kernel sees the SAME quantized logits as the
    online-max one (the cap is exact on the int32 dot), so outputs agree
    to fp32-accumulation noise — much tighter than the quantization
    tolerance vs exact attention."""
    fa = _interp(monkeypatch)
    q = _rand(0, (1, 300, 2, 32))
    k = _rand(1, (1, 520, 2, 32))
    v = _rand(2, (1, 520, 2, 32))
    scale = 1.0 / np.sqrt(32)
    o_cap = np.asarray(fa._flash_fwd_4d_int8(q, k, v, scale, block_q=128,
                                             block_k=128, capped=True),
                       np.float32)
    o_on = np.asarray(fa._flash_fwd_4d_int8(q, k, v, scale, block_q=128,
                                            block_k=128, capped=False),
                      np.float32)
    np.testing.assert_allclose(o_cap, o_on, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("mag", [8.0, 24.0])
def test_pallas_int8_4d_capped_magnitude_stress(mag, monkeypatch):
    """Logit magnitudes far beyond trained-attention levels must not flush
    rows: the capped int8 kernel stays at quantization-noise agreement
    with exact attention."""
    fa = _interp(monkeypatch)
    q = _rand(0, (1, 300, 2, 32)) * mag
    k = _rand(1, (1, 300, 2, 32))
    v = _rand(2, (1, 300, 2, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_4d_int8(q, k, v, scale, block_q=128,
                                           block_k=128, capped=True),
                     np.float32)
    want = np.asarray(sdpa(q, k, v, scale=scale), np.float32)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.99, cos


def test_int8_capped_env_gate(monkeypatch):
    """FLASH_CAPPED=0 routes the int8 path to the online-max kernel."""
    fa = _interp(monkeypatch)
    monkeypatch.setenv("FLASH_CAPPED", "0")
    q = _rand(0, (1, 256, 2, 32))
    k = _rand(1, (1, 256, 2, 32))
    v = _rand(2, (1, 256, 2, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_4d_int8(q, k, v, scale, block_q=128,
                                           block_k=128), np.float32)
    want = np.asarray(sdpa(q, k, v, scale=scale), np.float32)
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520), (256, 900)])
def test_pallas_4d_dual_kernel_interpret_mode(sq, sk, monkeypatch):
    """Dual-chain variant (two KV chains merged per step) == sdpa,
    including tail padding that clips an entire second half-block."""
    fa = _interp(monkeypatch)
    q = _rand(0, (2, sq, 3, 32))
    k = _rand(1, (2, sk, 3, 32))
    v = _rand(2, (2, sk, 3, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_4d(q, k, v, scale, block_q=128,
                                      block_k=128, dual=True))
    want = np.asarray(sdpa(q, k, v, scale=scale))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520)])
def test_flash_custom_vjp_grads_match_sdpa(sq, sk, monkeypatch):
    """The O(S) blockwise backward (_fa_bwd, driven by the kernel's saved
    logsumexp) against direct autodiff of sdpa — including the padded-KV
    masking path."""
    from jax.experimental import pallas as pl
    import video_styler_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp_call)

    q = _rand(0, (1, sq, 2, 32))
    k = _rand(1, (1, sk, 2, 32))
    v = _rand(2, (1, sk, 2, 32))
    scale = 1.0 / np.sqrt(32)
    g = _rand(3, (1, sq, 2, 32))

    def loss_flash(q, k, v):
        return jnp.sum(fa._flash_4d(q, k, v, scale) * g)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, scale=scale) * g)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_flash_3d_custom_vjp_grads(monkeypatch):
    from jax.experimental import pallas as pl
    import video_styler_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp_call)
    q = _rand(0, (2, 200, 32))
    k = _rand(1, (2, 140, 32))
    v = _rand(2, (2, 140, 32))
    scale = 1.0 / np.sqrt(32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(fa._flash_3d(q, k, v, scale)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(chunked_attention(q, k, v, scale,
                                                    block_k=128)))

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fa_bwd_low_memory_residuals(monkeypatch):
    """The vjp residuals must be O(S*D): (q, k, v, out, logsumexp) — not a
    stacked per-step softmax. Checked structurally on the fwd rule."""
    from jax.experimental import pallas as pl
    import video_styler_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp_call)
    q = _rand(0, (1, 256, 2, 32))
    out, res = fa._flash_4d_fwd(q, q, q, 0.1)
    total = sum(np.prod(r.shape) for r in res)
    assert total <= 5 * np.prod(q.shape)  # 4 tensors + stats, no S^2 term


@pytest.mark.parametrize("sq,sk", [(256, 256), (300, 520), (520, 300)])
def test_fa_bwd_pallas_matches_xla(sq, sk, monkeypatch):
    """The Pallas dKV/dQ backward kernels against the XLA scan backward
    (_fa_bwd) — covers Q-pad (inert rows via +1e30 logsumexp) and KV-pad
    (-inf mask) paths."""
    from jax.experimental import pallas as pl
    import video_styler_tpu.ops.flash_attention as fa

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", interp_call)

    n, d = 2, 128
    q = _rand(0, (1, sq, n, d))
    k = _rand(1, (1, sk, n, d))
    v = _rand(2, (1, sk, n, d))
    g = _rand(3, (1, sq, n, d))
    scale = 1.0 / np.sqrt(d)
    out, l2 = fa._flash_fwd_4d(q, k, v, scale, block_q=128, block_k=128,
                               return_stats=True)

    got = fa._fa_bwd_pallas(q, k, v, out, l2, g, scale,
                            block_q=128, block_k=128)

    def to3(t):
        b, s, nn, dd = t.shape
        return t.transpose(0, 2, 1, 3).reshape(b * nn, s, dd)

    want = fa._fa_bwd(to3(q), to3(k), to3(v), to3(out),
                      l2.reshape(-1, sq), to3(g), scale, block_k=128)
    want = [w.reshape(1, n, -1, d).transpose(0, 2, 1, 3) for w in want]
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mag", [1.0, 8.0, 24.0])
def test_pallas_4d_capped_kernel(mag, monkeypatch):
    """Capped-softmax kernel == sdpa across logit magnitudes.

    mag scales q so max |logit| reaches ~mag * sqrt(D) * scale levels —
    24.0 drives natural-log logits to ~100+, well past anything a trained
    attention produces, probing the cap's fp32 slack envelope."""
    fa = _interp(monkeypatch)
    q = _rand(0, (2, 300, 3, 32)) * mag
    k = _rand(1, (2, 520, 3, 32))
    v = _rand(2, (2, 520, 3, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_4d(q, k, v, scale, block_q=128,
                                      block_k=128, capped=True))
    want = np.asarray(sdpa(q, k, v, scale=scale))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_pallas_4d_capped_matches_online(monkeypatch):
    """Capped and online-max kernels agree to fp32-accumulation noise,
    including the stats (logsumexp) output the backward consumes."""
    fa = _interp(monkeypatch)
    q = _rand(0, (1, 300, 2, 32))
    k = _rand(1, (1, 300, 2, 32))
    v = _rand(2, (1, 300, 2, 32))
    scale = 1.0 / np.sqrt(32)
    o_cap, l2_cap = fa._flash_fwd_4d(q, k, v, scale, block_q=128,
                                     block_k=128, capped=True,
                                     return_stats=True)
    o_on, l2_on = fa._flash_fwd_4d(q, k, v, scale, block_q=128,
                                   block_k=128, capped=False,
                                   return_stats=True)
    np.testing.assert_allclose(np.asarray(o_cap), np.asarray(o_on),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2_cap), np.asarray(l2_on),
                               rtol=1e-5, atol=1e-5)


def test_capped_env_gate(monkeypatch):
    """FLASH_CAPPED=0 falls back to the online-max kernel."""
    fa = _interp(monkeypatch)
    monkeypatch.setenv("FLASH_CAPPED", "0")
    q = _rand(0, (1, 256, 2, 32))
    k = _rand(1, (1, 256, 2, 32))
    v = _rand(2, (1, 256, 2, 32))
    scale = 1.0 / np.sqrt(32)
    got = np.asarray(fa._flash_fwd_4d(q, k, v, scale, block_q=128,
                                      block_k=128))
    want = np.asarray(sdpa(q, k, v, scale=scale))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
