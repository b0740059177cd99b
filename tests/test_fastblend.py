"""FastBlend: C++ vs XLA kernel parity, and end-to-end blending."""
import numpy as np
import pytest

from video_styler_tpu.extensions.fastblend.kernels import (
    CppKernels, JaxKernels, get_kernels,
)
from video_styler_tpu.extensions.fastblend.patch_match import (
    PatchMatcher, PyramidPatchMatcher,
)


def _pad(x, p):
    return np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    h, w, c, ps = 12, 10, 3, 5
    pad = ps // 2
    src = rng.standard_normal((2, h, w, c)).astype(np.float32)
    tgt = rng.standard_normal((2, h, w, c)).astype(np.float32)
    nnf = np.stack([rng.integers(0, h, (2, h, w)),
                    rng.integers(0, w, (2, h, w))], axis=3).astype(np.int32)
    return h, w, c, ps, pad, _pad(src, pad), _pad(tgt, pad), nnf


def _cpp_or_skip():
    try:
        return CppKernels()
    except ImportError:
        pytest.skip("native kernels unavailable")


def test_remap_parity(data):
    h, w, c, ps, pad, src, tgt, nnf = data
    cpp = _cpp_or_skip()
    jx = JaxKernels()
    a = cpp.remap(h, w, c, ps, pad, src, nnf)
    b = jx.remap(h, w, c, ps, pad, src, nnf)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_patch_error_parity(data):
    h, w, c, ps, pad, src, tgt, nnf = data
    cpp = _cpp_or_skip()
    jx = JaxKernels()
    a = cpp.patch_error(h, w, c, ps, pad, src, nnf, tgt)
    b = jx.patch_error(h, w, c, ps, pad, src, nnf, tgt)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pairwise_patch_error_parity(data):
    h, w, c, ps, pad, src, tgt, nnf = data
    cpp = _cpp_or_skip()
    jx = JaxKernels()
    a = cpp.pairwise_patch_error(h, w, c, ps, pad, src[0::2], nnf[0::2],
                                 src[1::2], nnf[1::2])
    b = jx.pairwise_patch_error(h, w, c, ps, pad, src[0::2], nnf[0::2],
                                src[1::2], nnf[1::2])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_identity_nnf_remap_recovers_image(data):
    """remap with identity NNF must reproduce the source (interior)."""
    h, w, c, ps, pad, src, tgt, nnf = data
    k = get_kernels()
    ident = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"),
                     axis=2).astype(np.int32)
    ident = np.stack([ident] * 2)
    out = k.remap(h, w, c, ps, pad, src, ident)
    np.testing.assert_allclose(out[:, pad:-pad, pad:-pad],
                               src[:, pad:-pad, pad:-pad], rtol=1e-4, atol=1e-4)


def test_patch_match_converges():
    """NNF estimation on a shifted image should reduce reconstruction error
    vs the initial identity NNF."""
    rng = np.random.default_rng(1)
    base = rng.random((24, 24, 3)).astype(np.float32) * 255
    shifted = np.roll(base, shift=3, axis=1)
    pm = PatchMatcher(24, 24, 3, minimum_patch_size=3, num_iter=3,
                      random_search_steps=2)
    ident = np.stack(np.meshgrid(np.arange(24), np.arange(24), indexing="ij"),
                     axis=2).astype(np.int32)[None]
    nnf, recon = pm.estimate_nnf(shifted[None], base[None], shifted[None],
                                 ident.copy())
    err_final = np.abs(pm.unpad_image(pm.pad_image(base[None])) * 0).mean()  # noqa
    recon_err = np.abs(recon[0] - base).mean()
    ident_err = np.abs(shifted - base).mean()
    assert recon_err < ident_err * 0.6


def test_balanced_runner_end_to_end():
    from video_styler_tpu.extensions.fastblend import FastBlendSmoother
    from PIL import Image
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (32, 32, 3), np.uint8)
    frames = [Image.fromarray((base + rng.integers(-10, 10, base.shape))
                              .clip(0, 255).astype(np.uint8)) for _ in range(4)]
    sm = FastBlendSmoother(batch_size=4, window_size=1,
                           ebsynth_config=dict(minimum_patch_size=3, num_iter=2,
                                               guide_weight=10.0))
    out = sm(frames)
    assert len(out) == 4
    assert out[0].size == (32, 32)
