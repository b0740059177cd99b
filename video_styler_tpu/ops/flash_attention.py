"""Pallas TPU flash attention (non-causal, online softmax).

Replaces the reference's external CUDA kernel chain (flash-attn 3/2 ->
SageAttention -> SDPA, wan_video_dit.py:28-61) with one TPU-native kernel.
The DiT's workloads:
  self-attention:  S_q = S_kv ~ 30k-75k tokens, head_dim 128, bf16
  cross-attention: S_q ~ 30k, S_kv = 512(+257), head_dim 128, bf16

Design: grid (batch*heads, q_blocks, kv_blocks), kv innermost. Running max /
denominator / fp32 accumulator live in VMEM scratch and persist across the
sequential kv steps; the output block is written once on the last kv step.
Q @ K^T and P @ V hit the MXU with fp32 accumulation. KV padding is masked
with -inf using statically-known sequence lengths.

Backward: jax.custom_vjp whose bwd differentiates a memory-safe chunked
(lax.scan) online-softmax implementation — numerically identical attention,
O(S * block) memory, so training at 30k tokens remats cleanly.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e (32k seq, 12 heads, d=128): 1024/2048 + exp2 -> 148 TF/s
# (75% of bf16 peak); 1024/1024 -> 139, 256/512 -> 65. 2048/2048 and
# 1024/3072 exceed the 16MB VMEM budget (the fp32 s block dominates).
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 2048
LOG2_E = 1.4426950408889634
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr,
                  acc_scr, *, kv_steps: int, kv_len: int, block_k: int):
    """The softmax scale (x log2 e) is folded into q by the caller (saves
    one (BQ, BK) VPU multiply per kv step), and the softmax runs in base 2
    (exp2 skips the VPU's base conversion; the normalization cancels the
    base exactly). The padding mask stays a plain iota+select: a lax.cond
    around it defeats the Mosaic pipeline (129 -> 76 TF/s) and a
    precomputed bias-row input stream is also slower (131 -> 127 TF/s)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (BQ, D)
    k = k_ref[0]                                    # (BK, D)
    v = v_ref[0]                                    # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BQ, BK)

    if kv_len % block_k != 0:
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(kv_pos < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                               # (BQ, 1)
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)                         # (BQ, BK) fp32
    alpha = jnp.exp2(m_prev - m_new)                # (BQ, 1)
    l_scr[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_fwd_3d(q, k, v, scale: float,
                  block_q: int = DEFAULT_BLOCK_Q,
                  block_k: int = DEFAULT_BLOCK_K):
    """q: (BH, Sq, D), k/v: (BH, Sk, D) -> (BH, Sq, D)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (sk - 1).bit_length()))
    q_steps = pl.cdiv(sq, block_q)
    kv_steps = pl.cdiv(sk, block_k)
    sq_pad = q_steps * block_q - sq
    sk_pad = kv_steps * block_k - sk
    if sq_pad:
        q = jnp.pad(q, ((0, 0), (0, sq_pad), (0, 0)))
    if sk_pad:
        k = jnp.pad(k, ((0, 0), (0, sk_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad), (0, 0)))

    q = (q.astype(jnp.float32) * (scale * LOG2_E)).astype(q.dtype)
    kernel = functools.partial(_flash_kernel, kv_steps=kv_steps,
                               kv_len=sk, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(bh, q_steps, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_steps * block_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(q, k, v)
    return out[:, :sq] if sq_pad else out


def chunked_attention(q, k, v, scale: float, block_k: int = 1024):
    """Differentiable memory-safe attention: lax.scan over KV blocks with an
    online softmax in fp32. Same math as the Pallas kernel; used as the
    custom_vjp backward (and as an interpret-mode check)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    steps = -(-sk // block_k)
    pad = steps * block_k - sk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kb = k.reshape(bh, steps, block_k, d)
    vb = v.reshape(bh, steps, block_k, d)
    qf = q.astype(jnp.float32)

    def body(carry, inputs):
        m_prev, l_prev, acc = carry
        kc, vc, start = inputs
        s = jnp.einsum("bqd,bkd->bqk", qf, kc.astype(jnp.float32)) * scale
        pos = start + jnp.arange(block_k)
        s = jnp.where(pos[None, None, :] < sk, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bqk,bkd->bqd", p, vc.astype(jnp.float32))
        return (m_new, l_new, acc), None

    init = (jnp.full((bh, sq, 1), NEG_INF, jnp.float32),
            jnp.zeros((bh, sq, 1), jnp.float32),
            jnp.zeros((bh, sq, d), jnp.float32))
    starts = jnp.arange(steps) * block_k
    (m, l, acc), _ = jax.lax.scan(
        body, init, (kb.transpose(1, 0, 2, 3), vb.transpose(1, 0, 2, 3), starts))
    return (acc / l).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_3d(q, k, v, scale):
    return _flash_fwd_3d(q, k, v, scale)


def _flash_3d_fwd(q, k, v, scale):
    return _flash_fwd_3d(q, k, v, scale), (q, k, v)


def _flash_3d_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: chunked_attention(q, k, v, scale), q, k, v)
    return vjp(g)


_flash_3d.defvjp(_flash_3d_fwd, _flash_3d_bwd)


def flash_attention(q, k, v, scale: Optional[float] = None):
    """q: (B, Sq, N, D), k/v: (B, Sk, N, D) -> (B, Sq, N, D)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, sq, n, d = q.shape
    sk = k.shape[1]
    q3 = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    out = _flash_3d(q3, k3, v3, scale)
    return out.reshape(b, n, sq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# int8 quantized flash attention (SageAttention-style)
# ---------------------------------------------------------------------------
#
# The reference's attention chain includes SageAttention
# (wan_video_dit.py:9-26); its trick maps perfectly to the v5e MXU, which
# runs int8 x int8 -> int32 at 2x the bf16 rate:
#   * subtract the per-(batch,head,channel) K mean before quantizing — the
#     dropped q.k_mean term is constant per query row, and softmax is
#     shift-invariant per row, so the result is unchanged;
#   * per-token absmax int8 scales for Q and K; QK^T on the int8 MXU,
#     dequantized with the outer product of the row scales (the softmax
#     scale and the exp2 base conversion fold into the Q scales);
#   * P @ V stays bf16 (V quantization costs accuracy for little gain:
#     the PV matmul is 50% of the attention FLOPs but V has no row
#     smoothing).
#
# Measured (v5e, 32k tokens, d=128): the kernel is softmax/VPU-bound at
# these block sizes, so int8 QK^T roughly breaks even with bf16 standalone
# (49.5 vs 47.4 ms; 1024/2048 best, 1024/4096+ exceed VMEM) and wins only
# when the surrounding DiT also runs int8 linears (232 vs 236 ms per 14B
# block). Kept opt-in, mirroring the reference's sageattention backend.

def _flash_kernel_int8(q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref,
                       m_scr, l_scr, acc_scr, *, kv_steps: int, kv_len: int,
                       block_k: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (BQ, D) int8
    k = k_ref[0]                                    # (BK, D) int8
    v = v_ref[0]                                    # (BK, D) bf16

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)           # (BQ, BK) int32
    # dequant: outer product of per-row scales (Q scales carry softmax
    # scale * log2 e)
    s = s.astype(jnp.float32) * qs_ref[0] * ks_ref[0]

    if kv_len % block_k != 0:
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(kv_pos < kv_len, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_scr[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _quantize_rows_int8(x):
    """(BH, S, D) -> (int8 values, (BH, S, 1) f32 scales)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-8)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _flash_fwd_3d_int8(q, k, v, scale: float,
                       block_q: int = DEFAULT_BLOCK_Q,
                       block_k: int = DEFAULT_BLOCK_K):
    """q/k/v: (BH, S, D) float -> (BH, Sq, D), attention computed with int8
    QK^T (K mean-smoothed) and bf16 PV."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (sk - 1).bit_length()))
    q_steps = pl.cdiv(sq, block_q)
    kv_steps = pl.cdiv(sk, block_k)
    sq_pad = q_steps * block_q - sq
    sk_pad = kv_steps * block_k - sk

    # K smoothing: softmax is invariant to the per-row constant q . k_mean
    k_smooth = k.astype(jnp.float32) - jnp.mean(k.astype(jnp.float32),
                                                axis=1, keepdims=True)
    q_i8, q_s = _quantize_rows_int8(q)
    k_i8, k_s = _quantize_rows_int8(k_smooth)
    q_s = q_s * (scale * LOG2_E)
    v = v.astype(jnp.bfloat16)

    if sq_pad:
        q_i8 = jnp.pad(q_i8, ((0, 0), (0, sq_pad), (0, 0)))
        q_s = jnp.pad(q_s, ((0, 0), (0, sq_pad), (0, 0)))
    if sk_pad:
        k_i8 = jnp.pad(k_i8, ((0, 0), (0, sk_pad), (0, 0)))
        k_s = jnp.pad(k_s, ((0, 0), (0, sk_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad), (0, 0)))
    ks_row = k_s.reshape(bh, 1, kv_steps * block_k if sk_pad else sk)

    kernel = functools.partial(_flash_kernel_int8, kv_steps=kv_steps,
                               kv_len=sk, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(bh, q_steps, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_steps * block_q, d),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=(q_i8.size + k_i8.size + v.size * 2),
            transcendentals=bh * sq * sk,
        ),
    )(q_i8, k_i8, v, q_s, ks_row)
    return out[:, :sq] if sq_pad else out


def flash_attention_int8(q, k, v, scale: Optional[float] = None):
    """SageAttention-style int8 flash attention.
    q: (B, Sq, N, D), k/v: (B, Sk, N, D) -> (B, Sq, N, D) bf16."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, sq, n, d = q.shape
    sk = k.shape[1]
    q3 = q.transpose(0, 2, 1, 3).reshape(b * n, sq, d)
    k3 = k.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    v3 = v.transpose(0, 2, 1, 3).reshape(b * n, sk, d)
    out = _flash_fwd_3d_int8(q3, k3, v3, scale)
    return out.reshape(b, n, sq, d).transpose(0, 2, 1, 3).astype(q.dtype)
