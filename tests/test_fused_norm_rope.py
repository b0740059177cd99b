"""Fused RMSNorm+RoPE kernel: interpret-mode parity vs the XLA composition."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.ops.fused_norm_rope as fnr
from video_styler_tpu.ops.fused_norm_rope import (
    fused_rmsnorm_rope, _reference, _fused_fwd,
)
from video_styler_tpu.ops.rope import assemble_freqs_grid


def _setup(b=1, fhw=(5, 6, 10), n=3, d=128, dtype=jnp.float32, key=0):
    f, h, w = fhw
    s = f * h * w
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    q = jax.random.normal(ks[0], (b, s, n * d), dtype)
    k = jax.random.normal(ks[1], (b, s, n * d), dtype) * 0.7
    wq = jax.random.normal(ks[2], (n * d,), dtype) * 0.1 + 1.0
    wk = jax.random.normal(ks[3], (n * d,), dtype) * 0.1 + 1.0
    cos, sin = assemble_freqs_grid(d, f, h, w)
    return q, k, wq, wk, cos, sin


def _interp(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fnr.pl, "pallas_call", interp_call)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("block_s", [128, 256])
def test_kernel_matches_reference(monkeypatch, dtype, block_s):
    _interp(monkeypatch)
    q, k, wq, wk, cos, sin = _setup(dtype=dtype)
    oq, ok = _fused_fwd(q, k, wq, wk, cos, sin, 1e-6, block_s=block_s)
    rq, rk = _reference(q, k, wq, wk, cos, sin, 1e-6)
    # identical op sequence; only the fp32 row-sum order differs
    tol = dict(rtol=2e-6, atol=2e-6) if dtype == jnp.float32 else \
        dict(rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(oq, np.float32),
                               np.asarray(rq, np.float32), **tol)
    np.testing.assert_allclose(np.asarray(ok, np.float32),
                               np.asarray(rk, np.float32), **tol)


def test_kernel_non_divisible_seq(monkeypatch):
    """S=231 (odd grid: 3*7*11) exercises the padded tail path."""
    _interp(monkeypatch)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    s, n, d = 231, 2, 128
    q = jax.random.normal(ks[0], (2, s, n * d), jnp.float32)
    k = jax.random.normal(ks[1], (2, s, n * d), jnp.float32)
    wq = jax.random.normal(ks[2], (n * d,)) * 0.1 + 1.0
    wk = jax.random.normal(ks[3], (n * d,)) * 0.1 + 1.0
    cos, sin = assemble_freqs_grid(d, 3, 7, 11)
    oq, ok = _fused_fwd(q, k, wq, wk, cos, sin, 1e-6, block_s=128)
    rq, rk = _reference(q, k, wq, wk, cos, sin, 1e-6)
    np.testing.assert_allclose(np.asarray(oq), np.asarray(rq),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(rk),
                               rtol=2e-6, atol=2e-6)


def test_rope_indices_flow_through(monkeypatch):
    """Keyframe editor rope_indices change only the cos/sin tables."""
    _interp(monkeypatch)
    q, k, wq, wk, _, _ = _setup()
    cos, sin = assemble_freqs_grid(128, 5, 6, 10,
                                   rope_indices=np.array([0, 1, 2, 9, 17]))
    oq, ok = _fused_fwd(q, k, wq, wk, cos, sin, 1e-6)
    rq, rk = _reference(q, k, wq, wk, cos, sin, 1e-6)
    np.testing.assert_allclose(np.asarray(oq), np.asarray(rq),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(rk),
                               rtol=2e-6, atol=2e-6)


def test_dispatch_cpu_fallback_and_grad():
    """On CPU the public entry runs the reference composition; gradients of
    the custom_vjp wrapper match direct autodiff of the reference."""
    q, k, wq, wk, cos, sin = _setup(fhw=(1, 6, 10), n=2, d=128)
    oq, ok = fused_rmsnorm_rope(q, k, wq, wk, cos, sin, 1e-6)
    rq, rk = _reference(q, k, wq, wk, cos, sin, 1e-6)
    np.testing.assert_allclose(np.asarray(oq), np.asarray(rq), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(rk), rtol=1e-6)

    def loss_fused(q, k, wq, wk):
        a, b = fnr._fused(q, k, wq, wk, cos, sin, 1e-6)
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    def loss_ref(q, k, wq, wk):
        a, b = _reference(q, k, wq, wk, cos, sin, 1e-6)
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    # _fused's forward would invoke the Pallas kernel; run it in interpret
    # mode by patching at the module level
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    fnr.pl.pallas_call = interp_call
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, wq, wk)
    finally:
        fnr.pl.pallas_call = orig
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, wq, wk)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("s", [300, 231])
def test_rms_only_kernel(monkeypatch, s):
    _interp(monkeypatch)
    from video_styler_tpu.ops.fused_norm_rope import _rms_fwd
    from video_styler_tpu.ops.basic import rms_norm
    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    x = jax.random.normal(ks[0], (2, s, 256), jnp.float32)
    w = jax.random.normal(ks[1], (256,)) * 0.1 + 1.0
    got = _rms_fwd(x, w, 1e-6, block_s=128)
    want = rms_norm({"scale": w}, x, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_rms_only_grad_matches():
    from video_styler_tpu.ops import fused_norm_rope as m
    from video_styler_tpu.ops.basic import rms_norm
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    x = jax.random.normal(ks[0], (1, 64, 256), jnp.float32)
    w = jax.random.normal(ks[1], (256,)) * 0.1 + 1.0

    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    m.pl.pallas_call = interp_call
    try:
        g = jax.grad(lambda x, w: jnp.sum(m._rms_pallas(x, w, 1e-6) ** 2),
                     argnums=(0, 1))(x, w)
    finally:
        m.pl.pallas_call = orig
    g_ref = jax.grad(
        lambda x, w: jnp.sum(rms_norm({"scale": w}, x, 1e-6) ** 2),
        argnums=(0, 1))(x, w)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
