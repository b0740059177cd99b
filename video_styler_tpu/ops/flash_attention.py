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

Backward: jax.custom_vjp with the standard flash-attention backward — the
forward also emits the per-row logsumexp, and the bwd recomputes S/P one KV
block at a time (lax.scan) to form dQ/dK/dV in O(S * block) memory. (The
previous bwd differentiated a chunked-scan forward, whose linearization
stacks a per-step fp32 P — 140 GB at the 14B shape; it could not compile.)
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e for the layout-native 4-D kernel (tools/sweep_flash_blocks):
#   14B self-attn (29,640 tok, 40 heads, d=128): 1024/1024 best; measured
#     126.8 ms overhead-calibrated (141.8 TF/s, 72.0% bf16 peak —
#     tools/bench_utils; the sweep's raw n=5 readings carry ~+8 ms each,
#     relative order unaffected): 1024/2048 and 512/1024 are worse.
#   1.3B self-attn (32,760 tok, 12 heads): 1024/1024 -> ~46 ms calibrated.
# 2048/2048 exceeds the VMEM budget (the fp32 s block dominates). The
# remaining gap to the 91 ms MXU floor is the softmax VPU chain
# (sub+exp2+max+sum over S^2*N elements) partially serializing with the MXU.
# Negative result (kept as the opt-in `dual` variant): splitting each KV
# tile into two independent QK->softmax chains per grid step, hoping the
# VLIW scheduler would overlap chain B's matmul with chain A's softmax,
# measures 137.16 ms at 1024/1024x2 — identical to the single-chain kernel
# (Mosaic serializes at the dependency fences); 512x2 (same VMEM as single
# 1024) is WORSE (143.6). int8 QK at the same shape: 139 ms — the 2x MXU
# int8 rate doesn't show because the kernel is VPU-bound.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
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
        # one broadcast ADD per element instead of iota+compare+select (4
        # VPU ops): the (1, BK) bias row costs O(BK) to build and the
        # kernel is VPU-bound at long seq (137 -> ~119 ms at 29,640 tokens)
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(kv_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)

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


def _flash_kernel_4d(q_ref, k_ref, v_ref, o_ref, *rest,
                     kv_steps: int, kv_len: int, block_k: int,
                     q_scale: float, with_stats: bool = False):
    """Layout-native variant: the (B, S, N, D) activations are viewed as
    (B, S, N*D) and each head's (BQ, D) tile is carved out as a COLUMN
    block (the head axis rides the grid via the index_map's column index),
    so the caller never materializes the (B*N, S, D) transpose — at the
    14B DiT shape that removes four ~300 MB HBM copies per self-attention
    call. The softmax scale (x log2 e) is folded into the q tile on-load
    (f32 upcast, multiply, bf16 downcast: identical rounding to the old
    out-of-kernel fold).

    with_stats=True additionally writes the base-2 logsumexp
    L2 = m + log2(l) per query row (the residual the O(S) blockwise
    backward needs — see _fa_bwd)."""
    if with_stats:
        l2_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (BQ, D)
    k = k_ref[0]                                    # (BK, D)
    v = v_ref[0]                                    # (BK, D)
    q = (q.astype(jnp.float32) * q_scale).astype(q.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BQ, BK)

    if kv_len % block_k != 0:
        # one broadcast ADD per element instead of iota+compare+select (4
        # VPU ops): the (1, BK) bias row costs O(BK) to build and the
        # kernel is VPU-bound at long seq (137 -> ~119 ms at 29,640 tokens)
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(kv_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)

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
        if with_stats:
            l2_ref[0, 0] = m_scr[:] + jnp.log2(l_scr[:])


def _flash_kernel_4d_capped(kmax_ref, q_ref, k_ref, v_ref, o_ref, *rest,
                            kv_steps: int, kv_len: int, block_k: int,
                            q_scale: float, with_stats: bool = False):
    """Capped softmax: no online max. Each query row gets a PER-ROW upper
    bound on its base-2 logits, m2_row = ||q_row|| * max_j||k_j||
    (Cauchy-Schwarz on the scaled q actually fed to the MXU, so
    s <= m2_row always): p = exp2(s - m2_row) <= 1 by construction — no
    overflow ever, and fp32's ~126-bit downward range absorbs the bound's
    slack. The row norm is recomputed from the resident q tile each KV
    step (a (BQ, D) reduce, ~1/8 the cost of one pass over s); only
    max||k|| rides in as a per-(batch, head) scalar. This deletes the
    per-KV-step max reduce, the m/alpha bookkeeping, and the acc rescale —
    the VPU chain that serialized against the MXU: measured 130.6 ->
    ~108 ms at the 14B self-attention shape (~84% peak), output diff at
    bf16 noise level vs the online-max kernel.

    Safety envelope: a row loses mass only where exp2(s - m2_row)
    underflows — s more than ~126 bits below the row's OWN cap. The gap is
    purely angular (log2 of max-cosine between q_row and the keys, plus
    the k-norm spread): a row would need its best key ~87 natural-log
    units below its Cauchy-Schwarz bound, i.e. essentially orthogonal to
    ALL keys at huge norms — unreachable for RMS-normed DiT q/k (verified
    by magnitude-stress tests vs exact softmax). The finalize guards l so
    a fully-flushed row yields 0, not NaN. FLASH_CAPPED=0 falls back to
    the online-max kernel."""
    if with_stats:
        l2_ref, l_scr, acc_scr = rest
    else:
        l_scr, acc_scr = rest
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (BQ, D)
    k = k_ref[0]                                    # (BK, D)
    v = v_ref[0]
    q = (q.astype(jnp.float32) * q_scale).astype(q.dtype)
    # per-row cap on the scaled, downcast q the MXU actually sees; the
    # 1.0001 covers the dot's f32 accumulation rounding past the bound
    qf = q.astype(jnp.float32)
    kmax = kmax_ref[pl.program_id(0), pl.program_id(1)]
    m2 = jnp.sqrt(jnp.sum(qf * qf, axis=1, keepdims=True)) \
        * (kmax * 1.0001)                            # (BQ, 1)
    # Clamp: p = exp2(s - m2) may then exceed 1, but fp32's +127 headroom
    # absorbs it (overflow-safe to s2 ~ +208, underflow-safe down to a row
    # max of ~-30), so even absurd logit magnitudes stay exact — the clamp
    # converts the far-out-of-envelope failure mode from row flush to none.
    m2 = jnp.minimum(m2, 96.0)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BQ, BK)

    s = s - m2
    if kv_len % block_k != 0:
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(kv_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)
    p = jnp.exp2(s)                                  # (BQ, BK) fp32, <= 1
    l_scr[:] += jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:], 1e-37)             # flushed row -> 0, not NaN
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        if with_stats:
            l2_ref[0, 0] = m2 + jnp.log2(l)


def _flash_kernel_4d_dual(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr,
                          acc_scr, *, kv_steps: int, kv_len: int,
                          block_k: int, q_scale: float):
    """Two independent QK->softmax chains per grid step, merged into one
    m/l/acc update. The per-step body QK -> softmax -> PV is a serial
    MXU -> VPU -> MXU dependency chain (the measured 136.5 ms at the 14B
    shape vs the 91 ms MXU floor is mostly unoverlapped VPU softmax);
    splitting the KV tile in two gives the VLIW scheduler independent work
    to interleave — chain B's matmul can run while chain A's softmax is on
    the VPU — and halves the m/l bookkeeping per element."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (BQ, D)
    k2 = k_ref[0]                                   # (2*BK, D)
    v2 = v_ref[0]
    q = (q.astype(jnp.float32) * q_scale).astype(q.dtype)

    sa = jax.lax.dot_general(
        q, k2[:block_k], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BQ, BK)
    sb = jax.lax.dot_general(
        q, k2[block_k:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if kv_len % (2 * block_k) != 0:
        base = ki * (2 * block_k) + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        sa = sa + jnp.where(base < kv_len, 0.0, NEG_INF).astype(jnp.float32)
        sb = sb + jnp.where(base + block_k < kv_len, 0.0,
                            NEG_INF).astype(jnp.float32)

    m_prev = m_scr[:]                               # (BQ, 1)
    l_prev = l_scr[:]
    m_new = jnp.maximum(m_prev,
                        jnp.maximum(jnp.max(sa, axis=1, keepdims=True),
                                    jnp.max(sb, axis=1, keepdims=True)))
    pa = jnp.exp2(sa - m_new)                       # (BQ, BK) fp32
    pb = jnp.exp2(sb - m_new)
    alpha = jnp.exp2(m_prev - m_new)                # (BQ, 1)
    l_scr[:] = (l_prev * alpha
                + jnp.sum(pa, axis=1, keepdims=True)
                + jnp.sum(pb, axis=1, keepdims=True))
    acc_scr[:] = (acc_scr[:] * alpha
                  + jax.lax.dot_general(
                      pa.astype(v2.dtype), v2[:block_k],
                      (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(
                      pb.astype(v2.dtype), v2[block_k:],
                      (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32))
    m_scr[:] = m_new

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_fwd_4d(q, k, v, scale: float,
                  block_q: int = DEFAULT_BLOCK_Q,
                  block_k: int = DEFAULT_BLOCK_K,
                  dual: Optional[bool] = None,
                  capped: Optional[bool] = None,
                  return_stats: bool = False):
    """q: (B, Sq, N, D), k/v: (B, Sk, N, D) -> (B, Sq, N, D), no transposes.

    Internally runs on (B, S, N*D) views (free reshapes) with per-head
    column blocks — Mosaic's block-shape rule only allows the last two
    block dims, so the head axis cannot be a singleton block dim itself.

    capped=True (the default; FLASH_CAPPED=0 disables) uses the
    capped-softmax kernel: per-(batch, head) Cauchy-Schwarz logit bound
    instead of the online running max (see _flash_kernel_4d_capped —
    130.6 -> 108.1 ms at the 14B shape). dual=True processes two
    block_k-wide KV chains per grid step (see _flash_kernel_4d_dual);
    None reads the FLASH_DUAL env var (unset = off). return_stats=True
    (single-chain only) also returns the per-row base-2 logsumexp as
    (B, N, Sq) f32 — the backward's residual."""
    import os
    if dual is None:
        dual = os.environ.get("FLASH_DUAL", "0") == "1"
    if return_stats:
        dual = False
    if capped is None:
        capped = os.environ.get("FLASH_CAPPED", "1") == "1"
    capped = capped and not dual
    b, sq, n, d = q.shape
    sk = k.shape[1]
    if capped:
        # per-(b, h) max key norm (one cheap bandwidth pass over k,
        # ~0.8 ms at the 14B shape); the per-ROW q part of the cap is
        # computed inside the kernel from the resident q tile
        kn = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1))
        kmax = jnp.max(kn, axis=1)                   # (B, N) f32
    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (sk - 1).bit_length()))
    kv_tile = 2 * block_k if dual else block_k
    q_steps = pl.cdiv(sq, block_q)
    kv_steps = pl.cdiv(sk, kv_tile)
    sq_pad = q_steps * block_q - sq
    sk_pad = kv_steps * kv_tile - sk
    q = q.reshape(b, sq, n * d)
    k = k.reshape(b, sk, n * d)
    v = v.reshape(b, sk, n * d)
    if sq_pad:
        q = jnp.pad(q, ((0, 0), (0, sq_pad), (0, 0)))
    if sk_pad:
        k = jnp.pad(k, ((0, 0), (0, sk_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad), (0, 0)))

    kernel = functools.partial(
        _flash_kernel_4d_capped if capped else
        (_flash_kernel_4d_dual if dual else _flash_kernel_4d),
        kv_steps=kv_steps, kv_len=sk, block_k=block_k,
        q_scale=scale * LOG2_E)
    out_specs = pl.BlockSpec((1, block_q, d), lambda b, n, qi, ki: (b, qi, n))
    out_shape = jax.ShapeDtypeStruct((b, q_steps * block_q, n * d), q.dtype)
    if return_stats:
        kernel = functools.partial(kernel, with_stats=True)
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, block_q, 1),
                                  lambda b, n, qi, ki: (b, n, qi, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, n, q_steps * block_q, 1),
                                          jnp.float32)]
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, n, qi, ki: (b, qi, n)),
        pl.BlockSpec((1, kv_tile, d), lambda b, n, qi, ki: (b, ki, n)),
        pl.BlockSpec((1, kv_tile, d), lambda b, n, qi, ki: (b, ki, n)),
    ]
    if capped:
        # scalar-prefetch arg: index maps gain a trailing ref argument
        def _fix(spec):
            f = spec.index_map
            return pl.BlockSpec(spec.block_shape,
                                lambda b, n, qi, ki, m2, _f=f:
                                _f(b, n, qi, ki))
        grid_kwargs = dict(grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n, q_steps, kv_steps),
            in_specs=[_fix(s) for s in in_specs],
            out_specs=([_fix(s) for s in out_specs]
                       if isinstance(out_specs, list) else _fix(out_specs)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ]))
        args = (kmax, q, k, v)
    else:
        grid_kwargs = dict(
            grid=(b, n, q_steps, kv_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ])
        args = (q, k, v)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * n * sq * sk,
        ),
        **grid_kwargs,
    )(*args)
    if return_stats:
        out, l2 = out
        out = out[:, :sq] if sq_pad else out
        l2 = l2[..., :sq, 0] if sq_pad else l2[..., 0]
        return out.reshape(b, sq, n, d), l2
    out = out[:, :sq] if sq_pad else out
    return out.reshape(b, sq, n, d)


def chunked_attention(q, k, v, scale: float, block_k: int = 1024):
    """Memory-safe attention forward: lax.scan over KV blocks with an
    online softmax in fp32. Same math as the Pallas kernel; the
    interpret-mode/CPU oracle for the kernel tests. (NOT used as the
    custom_vjp backward — differentiating this scan stores per-step P;
    see _fa_bwd for the real blockwise backward.)"""
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


def _fa_bwd(q, k, v, o, l2, g, scale: float, block_k: int = 512):
    """Flash-attention backward, O(S * block) memory: recompute S/P one KV
    block at a time from the saved base-2 logsumexp instead of storing the
    (Sq x Sk) softmax (differentiating the chunked-scan forward stacks a
    per-step f32 P — 140 GB at the 14B DiT shape, which is why the old
    jax.vjp(chunked_attention) backward could not even compile there).

      D_i    = sum_d dO_id O_id
      P_ij   = exp2(c * q_i.k_j - L2_i),  c = scale * log2 e
      dV_j   = sum_i P_ij dO_i
      dS_ij  = P_ij * (dO_i . V_j - D_i)        (natural-base jacobian)
      dQ_i   = scale * sum_j dS_ij K_j ;  dK_j = scale * sum_i dS_ij Q_i

    q/k/v/o/g: (BH, S, D); l2: (BH, Sq). Matmul operands are cast to
    q.dtype (bf16 in production — standard FA backward practice); the dQ
    accumulator and all reductions stay fp32.

    Measured on v5e at the 14B self-attn shape (40 heads, 29,640 tokens):
    block_k 256/512/1024 -> 1329/1122/1024 ms (2048 exceeds HBM with the
    fp32 S transient). 512 is the default: within 10% of the best while
    keeping the per-step transients at ~2.4 GB so the streamed 14B train
    step still fits beside the resident weights."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    steps = pl.cdiv(sk, block_k)
    pad = steps * block_k - sk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kb = k.reshape(bh, steps, block_k, d).transpose(1, 0, 2, 3)
    vb = v.reshape(bh, steps, block_k, d).transpose(1, 0, 2, 3)
    starts = jnp.arange(steps) * block_k
    c = scale * LOG2_E
    di = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)                    # (BH, Sq, 1)
    l2e = l2.astype(jnp.float32)[..., None]                 # (BH, Sq, 1)
    gq = g.astype(q.dtype)

    def body(dq_acc, inputs):
        kc, vc, start = inputs
        s2 = jnp.einsum("bqd,bkd->bqk", q, kc,
                        preferred_element_type=jnp.float32) * c
        if pad:
            pos = start + jnp.arange(block_k)
            s2 = jnp.where(pos[None, None, :] < sk, s2, -jnp.inf)
        p = jnp.exp2(s2 - l2e)                              # (BH, Sq, BK)
        dv_j = jnp.einsum("bqk,bqd->bkd", p.astype(q.dtype), gq,
                          preferred_element_type=jnp.float32)
        dp = jnp.einsum("bqd,bkd->bqk", gq, vc,
                        preferred_element_type=jnp.float32)
        ds = (p * (dp - di)).astype(q.dtype)
        dq_acc = dq_acc + jnp.einsum(
            "bqk,bkd->bqd", ds, kc,
            preferred_element_type=jnp.float32) * scale
        dk_j = jnp.einsum("bqk,bqd->bkd", ds, q,
                          preferred_element_type=jnp.float32) * scale
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((bh, sq, d), jnp.float32)
    dq, (dk, dv) = jax.lax.scan(body, dq0, (kb, vb, starts))
    dk = dk.transpose(1, 0, 2, 3).reshape(bh, steps * block_k, d)
    dv = dv.transpose(1, 0, 2, 3).reshape(bh, steps * block_k, d)
    if pad:
        dk, dv = dk[:, :sk], dv[:, :sk]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _fa_bwd_kernel_dkv(q_ref, k_ref, v_ref, g_ref, l2_ref, d_ref,
                       dk_ref, dv_ref, dk_scr, dv_scr,
                       *, q_steps: int, c_scale: float, scale: float):
    """dK/dV for one KV block: iterate Q blocks on the innermost grid axis,
    accumulate in VMEM. Padded Q rows are neutralized by their padded
    logsumexp (+1e30 -> P = 0), so no mask is needed here; padded KV rows
    produce garbage that the caller slices off."""
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                                     # (BQ, D)
    g = g_ref[0]                                     # (BQ, D)
    k = k_ref[0]                                     # (BK, D)
    v = v_ref[0]
    l2 = l2_ref[0, 0]                                # (BQ, 1)
    d = d_ref[0, 0]                                  # (BQ, 1)

    s2 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * c_scale  # (BQ, BK)
    p = jnp.exp2(s2 - l2)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BK, D)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BQ, BK)
    ds = (p * (dp - d) * scale).astype(q.dtype)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BK, D)

    @pl.when(qi == q_steps - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _fa_bwd_kernel_dq(q_ref, k_ref, v_ref, g_ref, l2_ref, d_ref,
                      dq_ref, dq_scr,
                      *, kv_steps: int, kv_len: int, block_k: int,
                      c_scale: float, scale: float):
    """dQ for one Q block: iterate KV blocks innermost. Padded KV columns
    must be masked to -inf (they would otherwise contribute to dQ)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    g = g_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    l2 = l2_ref[0, 0]
    d = d_ref[0, 0]

    s2 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * c_scale
    if kv_len % block_k != 0:
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s2.shape[1]), 1)
        s2 = s2 + jnp.where(kv_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)
    p = jnp.exp2(s2 - l2)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - d) * scale).astype(q.dtype)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _fa_bwd_pallas(q, k, v, o, l2, g, scale: float,
                   block_q: int = DEFAULT_BLOCK_Q,
                   block_k: int = DEFAULT_BLOCK_K):
    """Pallas flash-attention backward, layout-native like the forward.

    q/k/v/o/g: (B, S, N, D); l2: (B, N, Sq) base-2 logsumexp from the
    forward. Two kernels: dK/dV (grid over KV blocks, Q innermost) and dQ
    (grid over Q blocks, KV innermost) — same math as _fa_bwd but tiled
    through VMEM, ~3x faster than the XLA scan at the 14B shape and far
    smaller programs to compile."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (sk - 1).bit_length()))
    q_steps = pl.cdiv(sq, block_q)
    kv_steps = pl.cdiv(sk, block_k)
    sq_pad = q_steps * block_q - sq
    sk_pad = kv_steps * block_k - sk

    di = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1)                               # (B, Sq, N)
    di = di.transpose(0, 2, 1)[..., None]               # (B, N, Sq, 1)
    l2c = l2[..., None].astype(jnp.float32)             # (B, N, Sq, 1)

    q2 = q.reshape(b, sq, n * d)
    k2 = k.reshape(b, sk, n * d)
    v2 = v.reshape(b, sk, n * d)
    g2 = g.reshape(b, sq, n * d)
    if sq_pad:
        q2 = jnp.pad(q2, ((0, 0), (0, sq_pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, 0), (0, sq_pad), (0, 0)))
        # padded logsumexp -> P = exp2(s - 1e30) = 0: padded rows are inert
        l2c = jnp.pad(l2c, ((0, 0), (0, 0), (0, sq_pad), (0, 0)),
                      constant_values=1e30)
        di = jnp.pad(di, ((0, 0), (0, 0), (0, sq_pad), (0, 0)))
    if sk_pad:
        k2 = jnp.pad(k2, ((0, 0), (0, sk_pad), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, sk_pad), (0, 0)))

    c_scale = scale * LOG2_E
    qspec = pl.BlockSpec((1, block_q, d), lambda b, n, i, j: (b, j, n))
    kspec = pl.BlockSpec((1, block_k, d), lambda b, n, i, j: (b, i, n))
    rowspec = pl.BlockSpec((1, 1, block_q, 1), lambda b, n, i, j: (b, n, j, 0))
    dkv = pl.pallas_call(
        functools.partial(_fa_bwd_kernel_dkv, q_steps=q_steps,
                          c_scale=c_scale, scale=scale),
        grid=(b, n, kv_steps, q_steps),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, n, i, j: (b, i, n)),
            pl.BlockSpec((1, block_k, d), lambda b, n, i, j: (b, i, n)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, kv_steps * block_k, n * d), k.dtype),
            jax.ShapeDtypeStruct((b, kv_steps * block_k, n * d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * sq * sk * d,
            bytes_accessed=2 * (q2.size + k2.size) * q.dtype.itemsize,
            transcendentals=b * n * sq * sk,
        ),
    )(q2, k2, v2, g2, l2c, di)
    dk2, dv2 = dkv

    dq2 = pl.pallas_call(
        functools.partial(_fa_bwd_kernel_dq, kv_steps=kv_steps, kv_len=sk,
                          block_k=block_k, c_scale=c_scale, scale=scale),
        grid=(b, n, q_steps, kv_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, n, i, j: (b, i, n)),
            pl.BlockSpec((1, block_k, d), lambda b, n, i, j: (b, j, n)),
            pl.BlockSpec((1, block_k, d), lambda b, n, i, j: (b, j, n)),
            pl.BlockSpec((1, block_q, d), lambda b, n, i, j: (b, i, n)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, n, i, j: (b, n, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, n, i, j: (b, n, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, n, i, j: (b, i, n)),
        out_shape=jax.ShapeDtypeStruct((b, q_steps * block_q, n * d),
                                       q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * sq * sk * d,
            bytes_accessed=2 * (q2.size + k2.size) * q.dtype.itemsize,
            transcendentals=b * n * sq * sk,
        ),
    )(q2, k2, v2, g2, l2c, di)

    dq = (dq2[:, :sq] if sq_pad else dq2).reshape(b, sq, n, d)
    dk = (dk2[:, :sk] if sk_pad else dk2).reshape(b, sk, n, d)
    dv = (dv2[:, :sk] if sk_pad else dv2).reshape(b, sk, n, d)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_3d(q, k, v, scale):
    return _flash_fwd_3d(q, k, v, scale)


def _flash_3d_fwd(q, k, v, scale):
    # n=1 4-D view has the identical memory layout; reuse its stats output
    out, l2 = _flash_fwd_4d(q[:, :, None], k[:, :, None], v[:, :, None],
                            scale, return_stats=True)
    out = out[:, :, 0]
    return out, (q, k, v, out, l2[:, 0])


def _flash_3d_bwd(scale, res, g):
    q, k, v, o, l2 = res
    if jax.default_backend() == "tpu" and q.shape[-1] % 128 == 0:
        dq, dk, dv = _fa_bwd_pallas(q[:, :, None], k[:, :, None],
                                    v[:, :, None], o[:, :, None],
                                    l2[:, None], g[:, :, None], scale)
        return dq[:, :, 0], dk[:, :, 0], dv[:, :, 0]
    return _fa_bwd(q, k, v, o, l2, g, scale)


_flash_3d.defvjp(_flash_3d_fwd, _flash_3d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_4d(q, k, v, scale):
    return _flash_fwd_4d(q, k, v, scale)


def _flash_4d_fwd(q, k, v, scale):
    out, l2 = _flash_fwd_4d(q, k, v, scale, return_stats=True)
    return out, (q, k, v, out, l2)


def _flash_4d_bwd(scale, res, g):
    q, k, v, o, l2 = res
    if jax.default_backend() == "tpu" and q.shape[-1] % 128 == 0:
        return _fa_bwd_pallas(q, k, v, o, l2, g, scale)
    b, sq, n, d = q.shape
    sk = k.shape[1]

    def to3(t, s):
        return t.transpose(0, 2, 1, 3).reshape(b * n, s, d)

    dq, dk, dv = _fa_bwd(to3(q, sq), to3(k, sk), to3(v, sk), to3(o, sq),
                         l2.reshape(b * n, sq), to3(g, sq), scale)

    def to4(t, s):
        return t.reshape(b, n, s, d).transpose(0, 2, 1, 3)

    return to4(dq, sq), to4(dk, sk), to4(dv, sk)


_flash_4d.defvjp(_flash_4d_fwd, _flash_4d_bwd)


def flash_attention(q, k, v, scale: Optional[float] = None):
    """q: (B, Sq, N, D), k/v: (B, Sk, N, D) -> (B, Sq, N, D).

    Layout-native: the Pallas grid iterates the head axis directly, so the
    (B, S, N, D) activations are never transposed to (B*N, S, D) — that
    transpose cost four ~300 MB HBM copies per self-attention call at the
    14B DiT shape. The backward is the standard blockwise flash backward
    (dK/dV and dQ Pallas kernels recomputing S/P from the forward's saved
    logsumexp — O(S * block) memory; XLA scan fallback off-TPU)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_4d(q, k, v, scale)


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
        # one broadcast ADD per element instead of iota+compare+select (4
        # VPU ops): the (1, BK) bias row costs O(BK) to build and the
        # kernel is VPU-bound at long seq (137 -> ~119 ms at 29,640 tokens)
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(kv_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)

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


def _flash_kernel_int8_4d(q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref,
                          m_scr, l_scr, acc_scr, *, kv_steps: int,
                          kv_len: int, block_k: int):
    ki = pl.program_id(3)

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
    s = s.astype(jnp.float32) * qs_ref[0, 0] * ks_ref[0, 0]

    if kv_len % block_k != 0:
        # one broadcast ADD per element instead of iota+compare+select (4
        # VPU ops): the (1, BK) bias row costs O(BK) to build and the
        # kernel is VPU-bound at long seq (137 -> ~119 ms at 29,640 tokens)
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(kv_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)

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


def _flash_kernel_int8_4d_capped(q_ref, k_ref, v_ref, qs_ref, ks_ref,
                                 m2_ref, o_ref, l_scr, acc_scr, *,
                                 kv_steps: int, kv_len: int, block_k: int):
    """Capped-softmax int8 kernel (see _flash_kernel_4d_capped for the
    idea). The int8 path's per-row logit bound is EXACT on the quantized
    values the MXU sees: the int32 dot obeys |q_i8 . k_i8| <=
    ||q_i8|| * ||k_i8|| with no rounding (integer arithmetic), so
    s[i,j] = dot * qs_i * ks_j <= qs_i*||q_i8_i|| * max_j(ks_j*||k_i8_j||)
    = m2_i. Unlike the bf16 kernel nothing is recomputed in-kernel: the
    wrapper already makes an XLA quantize pass over q/k, and the row-norm
    reduces fuse into it — m2 rides in as a (B, N, Sq, 1) vector exactly
    like the q scales. Deletes the per-KV-step max reduce, the m/alpha
    bookkeeping, and the acc rescale from the VPU chain that bounds this
    kernel."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                    # (BQ, D) int8
    k = k_ref[0]                                    # (BK, D) int8
    v = v_ref[0]                                    # (BK, D) bf16

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)           # (BQ, BK) int32
    s = s.astype(jnp.float32) * qs_ref[0, 0] * ks_ref[0, 0] - m2_ref[0, 0]

    if kv_len % block_k != 0:
        kv_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, s.shape[1]), 1)
        s = s + jnp.where(kv_pos < kv_len, 0.0, NEG_INF).astype(jnp.float32)

    p = jnp.exp2(s)                                  # (BQ, BK) fp32, <= 1
    l_scr[:] += jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:], 1e-37)             # flushed row -> 0, not NaN
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _flash_fwd_4d_int8(q, k, v, scale: float,
                       block_q: int = DEFAULT_BLOCK_Q,
                       block_k: Optional[int] = None,
                       capped: Optional[bool] = None):
    """q/k/v: (B, S, N, D) float -> (B, Sq, N, D) bf16; int8 QK^T (K
    mean-smoothed over tokens), bf16 PV — layout-native, no transposes.

    The per-token scale vectors ride as (B, N, Sq, 1) / (B, N, 1, Sk)
    arrays whose singleton axes satisfy Mosaic's last-two-dims block rule
    (they are tiny: B*N*S floats).

    capped=True (default; FLASH_CAPPED=0 disables) replaces the online
    max with the exact per-row Cauchy-Schwarz bound on the quantized
    logits (_flash_kernel_int8_4d_capped)."""
    import os
    if capped is None:
        capped = os.environ.get("FLASH_CAPPED", "1") == "1"
    if block_k is None:
        # sweep at the 14B shape (tools/bench_int8_capped.py, calibrated):
        # capped has no running-max dependency chain, so the wider KV tile
        # wins (115.0 ms vs 119.3 at 1024); online-max keeps 1024
        block_k = 2048 if capped else DEFAULT_BLOCK_K
    b, sq, n, d = q.shape
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
    q_i8, q_s = _quantize_rows_int8(q)              # scales (B, Sq, N, 1)
    k_i8, k_s = _quantize_rows_int8(k_smooth)
    q_s = q_s * (scale * LOG2_E)
    v = v.astype(jnp.bfloat16)

    if capped:
        # exact per-row logit cap (fuses into the quantize pass):
        # m2_i = qs_i*||q_i8_i|| * max_j(ks_j*||k_i8_j||); the 1.0001
        # covers the f32 norm rounding (the int32 dot itself is exact)
        qn = jnp.sqrt(jnp.sum(jnp.square(q_i8.astype(jnp.float32)),
                              axis=-1, keepdims=True))   # (B, Sq, N, 1)
        kn = jnp.sqrt(jnp.sum(jnp.square(k_i8.astype(jnp.float32)),
                              axis=-1, keepdims=True))
        kmax = jnp.max(k_s * kn, axis=1, keepdims=True)  # (B, 1, N, 1)
        m2 = jnp.minimum(q_s * qn * kmax * 1.0001, 96.0)

    q_i8 = q_i8.reshape(b, sq, n * d)
    k_i8 = k_i8.reshape(b, sk, n * d)
    v = v.reshape(b, sk, n * d)
    qs_cols = q_s[..., 0].transpose(0, 2, 1)[..., None]  # (B, N, Sq, 1)
    ks_rows = k_s[..., 0].transpose(0, 2, 1)[:, :, None, :]  # (B, N, 1, Sk)
    m2_cols = (m2[..., 0].transpose(0, 2, 1)[..., None]  # (B, N, Sq, 1)
               if capped else None)
    if sq_pad:
        q_i8 = jnp.pad(q_i8, ((0, 0), (0, sq_pad), (0, 0)))
        qs_cols = jnp.pad(qs_cols, ((0, 0), (0, 0), (0, sq_pad), (0, 0)))
        if capped:
            m2_cols = jnp.pad(m2_cols, ((0, 0), (0, 0), (0, sq_pad), (0, 0)))
    if sk_pad:
        k_i8 = jnp.pad(k_i8, ((0, 0), (0, sk_pad), (0, 0)))
        ks_rows = jnp.pad(ks_rows, ((0, 0), (0, 0), (0, 0), (0, sk_pad)))
        v = jnp.pad(v, ((0, 0), (0, sk_pad), (0, 0)))

    row_spec = pl.BlockSpec((1, 1, block_q, 1),
                            lambda b, n, qi, ki: (b, n, qi, 0))
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, n, qi, ki: (b, qi, n)),
        pl.BlockSpec((1, block_k, d), lambda b, n, qi, ki: (b, ki, n)),
        pl.BlockSpec((1, block_k, d), lambda b, n, qi, ki: (b, ki, n)),
        row_spec,
        pl.BlockSpec((1, 1, 1, block_k),
                     lambda b, n, qi, ki: (b, n, 0, ki)),
    ]
    if capped:
        kernel = functools.partial(_flash_kernel_int8_4d_capped,
                                   kv_steps=kv_steps, kv_len=sk,
                                   block_k=block_k)
        in_specs = in_specs + [row_spec]
        args = (q_i8, k_i8, v, qs_cols, ks_rows, m2_cols)
        scratch = [pltpu.VMEM((block_q, 1), jnp.float32),
                   pltpu.VMEM((block_q, d), jnp.float32)]
    else:
        kernel = functools.partial(_flash_kernel_int8_4d, kv_steps=kv_steps,
                                   kv_len=sk, block_k=block_k)
        args = (q_i8, k_i8, v, qs_cols, ks_rows)
        scratch = [pltpu.VMEM((block_q, 1), jnp.float32),
                   pltpu.VMEM((block_q, 1), jnp.float32),
                   pltpu.VMEM((block_q, d), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(b, n, q_steps, kv_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda b, n, qi, ki: (b, qi, n)),
        out_shape=jax.ShapeDtypeStruct((b, q_steps * block_q, n * d),
                                       jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * sq * sk * d,
            bytes_accessed=(q_i8.size + k_i8.size + v.size * 2),
            transcendentals=b * n * sq * sk,
        ),
    )(*args)
    out = out[:, :sq] if sq_pad else out
    return out.reshape(b, sq, n, d)


def flash_attention_int8(q, k, v, scale: Optional[float] = None):
    """SageAttention-style int8 flash attention, layout-native.
    q: (B, Sq, N, D), k/v: (B, Sk, N, D) -> (B, Sq, N, D) in q.dtype."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_fwd_4d_int8(q, k, v, scale).astype(q.dtype)
