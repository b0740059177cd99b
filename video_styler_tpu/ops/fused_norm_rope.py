"""Fused RMSNorm + 3D-RoPE Pallas kernel for the DiT Q/K path.

The reference applies RMSNorm(eps=1e-6) then rotary embedding to Q and K
before attention (wan_video_dit.py:124-147). As separate XLA ops that chain
costs ~13 ms per 14B block at 29,640 tokens (measured: rope q+k 12.8 ms,
plus the rms_norm reduce/apply passes) — each op re-reads and re-writes the
~300 MB activations, and XLA's (…, D/2, 2) rotate lowers to layout shuffles.

This kernel does both in ONE pass over the projected activations:

  1. full-row fp32 RMS normalize (the norm spans the whole model dim, not
     per-head — matching the reference), cast to input dtype, multiply by
     the learned per-channel scale;
  2. rotate interleaved (even, odd) channel pairs with the per-token
     cos/sin tables in fp32.

The pair swap uses two lane rolls (+1 / S-1) and an even-lane select on the
per-head (BS, N, D) view — pairs never straddle a head boundary, so the
per-chunk wraparound entries are always discarded by the select. Math is
identical to ops.basic.rms_norm followed by ops.rope.rope_apply (same op
sequence and precisions; only the fp32 row-sum order may differ in the
last bits). Backward differentiates that reference composition via
custom_vjp, like ops.flash_attention.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .basic import rms_norm
from .rope import rope_apply

DEFAULT_BLOCK_S = 128


def _interleave_tables(cos, sin):
    """(S, D/2) cos/sin -> (S, D) cc/ss with cc[:, 2i] = cc[:, 2i+1] = cos_i,
    ss[:, 2i] = -sin_i, ss[:, 2i+1] = +sin_i, so that
    rope(x) = x * cc + swap_pairs(x) * ss."""
    s, half = cos.shape
    cc = jnp.repeat(cos, 2, axis=-1)
    ss = jnp.stack([-sin, sin], axis=-1).reshape(s, 2 * half)
    return cc, ss


def _fused_kernel(x_ref, w_ref, cc_ref, ss_ref, o_ref,
                  *, num_heads: int, eps: float):
    """One tensor per call: a combined q+k kernel (shared cc/ss loads)
    exceeds the Mosaic VMEM budget at the 14B shape (two block_s x 5120
    chains of f32 transients) and fails to compile."""
    cc = cc_ref[...][:, None, :]                     # (BS, 1, D) f32
    ss = ss_ref[...][:, None, :]
    x = x_ref[0]                                     # (BS, Dm) input dtype
    xf = x.astype(jnp.float32)
    r = jax.lax.rsqrt(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    xn = (xf * r).astype(x.dtype) * w_ref[...]       # rms_norm semantics
    bs, dm = xn.shape
    d = dm // num_heads
    x3 = xn.astype(jnp.float32).reshape(bs, num_heads, d)
    lane = jax.lax.broadcasted_iota(jnp.int32, x3.shape, 2)
    swapped = jnp.where((lane % 2) == 0,
                        pltpu.roll(x3, d - 1, 2),    # y[i] = x[i+1]
                        pltpu.roll(x3, 1, 2))        # y[i] = x[i-1]
    y = x3 * cc + swapped * ss
    o_ref[0] = y.reshape(bs, dm).astype(o_ref.dtype)


def _fused_fwd(q_proj, k_proj, wq, wk, cos, sin, eps: float,
               block_s: int = DEFAULT_BLOCK_S):
    """q_proj/k_proj: (B, S, Dm); wq/wk: (Dm,); cos/sin: (S, Dh/2) f32.
    Returns roped (B, S, N, Dh) pair where N*Dh = Dm, Dh = 2*cos.shape[1]."""
    b, s, dm = q_proj.shape
    d = 2 * cos.shape[1]
    n = dm // d
    cc, ss = _interleave_tables(cos.astype(jnp.float32),
                                sin.astype(jnp.float32))
    block_s = min(block_s, max(8, 1 << (s - 1).bit_length()))
    steps = pl.cdiv(s, block_s)
    pad = steps * block_s - s
    if pad:
        q_proj = jnp.pad(q_proj, ((0, 0), (0, pad), (0, 0)))
        k_proj = jnp.pad(k_proj, ((0, 0), (0, pad), (0, 0)))
        cc = jnp.pad(cc, ((0, pad), (0, 0)))
        ss = jnp.pad(ss, ((0, pad), (0, 0)))
    kernel = functools.partial(_fused_kernel, num_heads=n, eps=eps)

    def one(x, w):
        return pl.pallas_call(
            kernel,
            grid=(b, steps),
            in_specs=[
                pl.BlockSpec((1, block_s, dm), lambda b, si: (b, si, 0)),
                pl.BlockSpec((1, dm), lambda b, si: (0, 0)),
                pl.BlockSpec((block_s, d), lambda b, si: (si, 0)),
                pl.BlockSpec((block_s, d), lambda b, si: (si, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_s, dm), lambda b, si: (b, si, 0)),
            out_shape=jax.ShapeDtypeStruct((b, steps * block_s, dm), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=6 * b * s * dm,
                bytes_accessed=2 * b * s * dm * x.dtype.itemsize,
                transcendentals=b * s,
            ),
        )(x, w.astype(x.dtype).reshape(1, dm), cc, ss)

    oq = one(q_proj, wq)
    ok = one(k_proj, wk)
    if pad:
        oq, ok = oq[:, :s], ok[:, :s]
    return oq.reshape(b, s, n, d), ok.reshape(b, s, n, d)


def _reference(q_proj, k_proj, wq, wk, cos, sin, eps: float):
    """The exact XLA composition this kernel replaces."""
    b, s, dm = q_proj.shape
    d = 2 * cos.shape[1]
    n = dm // d
    q = rms_norm({"scale": wq}, q_proj, eps)
    k = rms_norm({"scale": wk}, k_proj, eps)
    q = rope_apply(q.reshape(b, s, n, d), cos, sin)
    k = rope_apply(k.reshape(b, s, n, d), cos, sin)
    return q, k


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused(q_proj, k_proj, wq, wk, cos, sin, eps):
    return _fused_fwd(q_proj, k_proj, wq, wk, cos, sin, eps)


def _fused_vjp_fwd(q_proj, k_proj, wq, wk, cos, sin, eps):
    return (_fused_fwd(q_proj, k_proj, wq, wk, cos, sin, eps),
            (q_proj, k_proj, wq, wk, cos, sin))


def _fused_vjp_bwd(eps, res, g):
    q_proj, k_proj, wq, wk, cos, sin = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _reference(a, b, c, d, cos, sin, eps),
        q_proj, k_proj, wq, wk)
    return vjp(g) + (None, None)


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def _rms_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    r = jax.lax.rsqrt(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    o_ref[0] = (xf * r).astype(x.dtype) * w_ref[...]


def _rms_fwd(x, w, eps: float, block_s: int = DEFAULT_BLOCK_S):
    b, s, dm = x.shape
    block_s = min(block_s, max(8, 1 << (s - 1).bit_length()))
    steps = pl.cdiv(s, block_s)
    pad = steps * block_s - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(b, steps),
        in_specs=[
            pl.BlockSpec((1, block_s, dm), lambda b, si: (b, si, 0)),
            pl.BlockSpec((1, dm), lambda b, si: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, dm), lambda b, si: (b, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, steps * block_s, dm), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * s * dm,
            bytes_accessed=2 * b * s * dm * x.dtype.itemsize,
            transcendentals=b * s,
        ),
    )(x, w.astype(x.dtype).reshape(1, dm))
    return out[:, :s] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rms_pallas(x, w, eps):
    return _rms_fwd(x, w, eps)


def _rms_vjp_fwd(x, w, eps):
    return _rms_fwd(x, w, eps), (x, w)


def _rms_vjp_bwd(eps, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda a, b: rms_norm({"scale": b}, a, eps), x, w)
    return vjp(g)


_rms_pallas.defvjp(_rms_vjp_fwd, _rms_vjp_bwd)


def fused_rmsnorm(x, w, eps: float = 1e-6,
                  use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Single-pass Pallas RMSNorm for long activations (the cross-attention
    Q path has no RoPE but still pays the norm's HBM round-trips as XLA
    ops). Identical semantics to ops.basic.rms_norm."""
    if use_pallas is None:
        # dm cap keeps the (block_s, dm) VMEM blocks inside Mosaic's budget
        # (a failure there surfaces at XLA compile time, where no python
        # fallback can catch it — so the gate must be conservative)
        use_pallas = (jax.default_backend() == "tpu"
                      and x.ndim == 3 and x.shape[-1] % 128 == 0
                      and x.shape[-1] <= 5120
                      and x.shape[1] >= 1024)
    if not use_pallas:
        return rms_norm({"scale": w}, x, eps)
    return _rms_pallas(x, w, eps)


def fused_rmsnorm_rope(q_proj, k_proj, wq, wk, cos, sin,
                       eps: float = 1e-6,
                       use_pallas: Optional[bool] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RMSNorm + RoPE for the Q/K pair in one fused pass.

    q_proj/k_proj: (B, S, N*D) pre-norm projections; wq/wk: (N*D,) norm
    scales; cos/sin: (S, D/2). Returns roped (B, S, N, D) q, k.
    Dispatches to the Pallas kernel on TPU; elsewhere runs the identical
    XLA composition (also the custom_vjp backward)."""
    if use_pallas is None:
        # lane-native head dim only (all real Wan configs are 128), model
        # dim capped so the (block_s, dm) VMEM blocks fit Mosaic's budget.
        # Mosaic/VMEM failures surface at XLA compile time — under jit no
        # python-level fallback can catch them, so the gate is the guard.
        use_pallas = (jax.default_backend() == "tpu"
                      and (2 * cos.shape[1]) % 128 == 0
                      and q_proj.shape[-1] % (2 * cos.shape[1]) == 0
                      and q_proj.shape[-1] <= 5120
                      # same minimum-sequence guard as fused_rmsnorm: at
                      # tiny S the pow2 block_s drops below the bf16
                      # sublane tile (Mosaic compile error under jit) and
                      # the kernel loses to the XLA composition anyway
                      and q_proj.shape[1] >= 1024)
    if not use_pallas:
        return _reference(q_proj, k_proj, wq, wk, cos, sin, eps)
    return _fused(q_proj, k_proj, wq, wk, cos, sin, eps)
