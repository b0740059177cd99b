"""Quantized linear path — the TPU answer to the reference fp8 matmul.

The reference runs its 4-minute baseline with fp8 weights and per-row
dynamically scaled `torch._scaled_mm`
(/root/reference/diffsynth/vram_management/layers.py:115-151). On TPU the
like-for-like trick is int8: the v5e MXU runs int8 x int8 -> int32 at 2x the
bf16 FLOP rate (394 vs 197 TOPS), and XLA lowers `lax.dot_general` on int8
operands to it directly. fp8 (e4m3) storage is also supported for HBM/
capacity savings on chips with native fp8.

Scheme (mirrors the reference's scaling structure):
  * weights: per-output-channel absmax scale, quantized once at load
  * activations: per-row (token) dynamic absmax scale, quantized per call
  * y = (x_q @ w_q) * x_scale * w_scale + b, accumulated in int32/f32

`quantize_params` rewrites linear leaves {"w", "b"} into
{"w_q", "w_scale", "b"}; `ops.basic.linear` dispatches on "w_q", so every
model in the framework picks the path up with no forward changes.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def quantize_weight_int8(w):
    """(..., in, out) float weight -> (int8 weight, (..., 1, out) f32 scale).
    A leading axis supports lax.scan-stacked per-layer weights."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight_fp8(w):
    """(..., in, out) float weight -> (e4m3 weight, (..., 1, out) f32 scale)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 448.0
    scale = jnp.maximum(scale, 1e-8)
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def linear_int8(p, x):
    """Dynamic-activation int8 linear: per-row x scale, per-col w scale."""
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["w_q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * p["w_scale"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_act_int8(x):
    """Per-row dynamic activation quantization, factored out so several
    linears sharing one input (q/k/v on the same modulated hidden state)
    quantize it ONCE — the round-2 tuning notes identified the per-call
    quantize passes as the gap between int8's 1.21x and the MXU's 2x."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def linear_int8_prequant(p, xq, xs, out_dtype):
    """int8 linear on an already-quantized activation (see quantize_act_int8)."""
    y = jax.lax.dot_general(
        xq, p["w_q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * p["w_scale"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def fused_qkv_int8(pq, pk, pv, x):
    """q/k/v as ONE int8 matmul on a runtime-concatenated weight: a single
    activation quantize + a single (S, in) @ (in, 3*out) MXU call, split
    after. Bit-identical to three separate linear_int8 calls (same
    accumulation order per output column)."""
    xq, xs = quantize_act_int8(x)
    w = jnp.concatenate([pq["w_q"], pk["w_q"], pv["w_q"]], axis=-1)
    s = jnp.concatenate([pq["w_scale"], pk["w_scale"], pv["w_scale"]], axis=-1)
    y = jax.lax.dot_general(
        xq, w, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * xs * s
    d = pq["w_q"].shape[-1]
    yq, yk, yv = y[..., :d], y[..., d:2 * d], y[..., 2 * d:]
    if "b" in pq:
        yq = yq + pq["b"].astype(jnp.float32)
    if "b" in pk:
        yk = yk + pk["b"].astype(jnp.float32)
    if "b" in pv:
        yv = yv + pv["b"].astype(jnp.float32)
    return (yq.astype(x.dtype), yk.astype(x.dtype), yv.astype(x.dtype))


def pack_int4(q):
    """(..., in, out) int8 values in [-8, 7] -> (..., in/2, out) packed bytes.

    Row 2i goes to the low nibble, row 2i+1 to the high nibble, so
    unpack_int4 is the exact inverse. `in` must be even."""
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed):
    """(..., in/2, out) packed bytes -> (..., in, out) int8 in [-8, 7].

    Arithmetic shifts on int8 sign-extend, recovering the signed nibbles."""
    lo = jnp.left_shift(packed, 4)
    lo = jnp.right_shift(lo, 4)
    hi = jnp.right_shift(packed, 4)
    both = jnp.stack([lo, hi], axis=-2)  # (..., in/2, 2, out)
    return both.reshape(packed.shape[:-2] + (packed.shape[-2] * 2,
                                             packed.shape[-1]))


def quantize_weight_int4(w):
    """(..., in, out) float weight -> (packed int4, (..., 1, out) f32 scale).

    Per-output-channel absmax like int8 but on the [-7, 7] grid; weights
    then live at 0.5 byte/param — HALF of int8 — which is what lets the
    full Wan-14B+VACE stack (~8.7 GB) sit HBM-resident on one 16 GB v5e
    (the w4a8 serving recipe; the reference has no counterpart — its fp8
    path still needs 11 GB + streaming, vram_management/layers.py:95-188)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 7.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    return pack_int4(q), scale


def quantize_weight_int4_g(w, group: int = 128):
    """Group-wise int4: one scale per (group of `group` input rows, output
    column) -> far lower error than per-column on real weights (the AWQ/
    GPTQ storage layout). Returns (packed, (..., in/group, 1, out) scales).
    Consumed by the w4a16 dequant path (linear_int4_g)."""
    wf = w.astype(jnp.float32)
    g = wf.reshape(wf.shape[:-2] + (wf.shape[-2] // group, group,
                                    wf.shape[-1]))
    scale = jnp.maximum(jnp.max(jnp.abs(g), axis=-2, keepdims=True) / 7.0,
                        1e-8)
    q = jnp.clip(jnp.round(g / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(wf.shape)
    return pack_int4(q), scale


def dequant_int4_leaf(p):
    """{"w_q4","w_scale",...} -> {"w_q" int8,"w_scale",...} (the int8 path's
    input). XLA materializes the unpacked weight as a block-local transient
    only — resident HBM stays at the packed size."""
    out = {k: v for k, v in p.items() if k != "w_q4"}
    out["w_q"] = unpack_int4(p["w_q4"])
    return out


def linear_int4(p, x):
    """w4a8: unpack the int4 nibbles to int8 and run the dynamic-activation
    int8 MXU path (2x bf16 rate). Unpack cost is one VPU pass over the
    packed bytes per use — ~0.1 ms/block against a ~250 ms block."""
    return linear_int8(dequant_int4_leaf(p), x)


def linear_int4_g(p, x):
    """w4a16 group-dequant: int4 -> x.dtype with per-group scales, then one
    full-precision matmul. 1x MXU rate but near-bf16 quality on real
    checkpoints; pick via quantize_params(mode="int4_g128"). The group size
    is recovered from the scale's extra (in/group) axis."""
    q = unpack_int4(p["w_q4"])  # (..., in, out)
    in_dim, out_dim = q.shape[-2], q.shape[-1]
    group = in_dim // p["w_scale"].shape[-3]
    g = q.reshape(q.shape[:-2] + (in_dim // group, group, out_dim))
    w = (g.astype(jnp.float32) * p["w_scale"]).astype(x.dtype)
    w = w.reshape(q.shape[:-2] + (in_dim, out_dim))
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def linear_fp8(p, x):
    """fp8 storage path (reference fp8_linear semantics: clamp-to-1 row
    scale); the matmul accumulates in f32 — native fp8 MXU where available,
    upcast elsewhere."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 448.0, 1.0)
    xq = (xf / xs).astype(jnp.float8_e4m3fn)
    y = jax.lax.dot_general(
        xq, p["w_q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y * xs * p["w_scale"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _is_linear_leaf(node) -> bool:
    return (isinstance(node, dict) and "w" in node
            and not isinstance(node["w"], dict)
            and getattr(node["w"], "ndim", 0) >= 2)


def quantize_params(params, mode: str = "int8",
                    predicate: Optional[Callable[[str, object], bool]] = None,
                    min_size: int = 1 << 16, min_dim: int = 128):
    """Walk a param pytree and quantize every linear leaf.

    predicate(path, leaf) -> bool can exclude layers (e.g. final heads,
    modulation tables). Leaves smaller than `min_size` elements stay in
    high precision (scales/LNs/small projections aren't worth it).

    Modes: "int8" (w8a8, 2x MXU), "fp8" (e4m3 storage), "int4" (w4a8
    per-column, 0.5 byte/param, 2x MXU), "int4_g128" (w4a16 group scales,
    near-bf16 quality).
    """
    group = int(mode.split("_g")[1]) if "_g" in mode else 0
    quant = {"int8": quantize_weight_int8, "fp8": quantize_weight_fp8,
             "int4": quantize_weight_int4}.get(mode)
    if quant is None:
        if not mode.startswith("int4_g"):
            raise ValueError(f"unknown quantization mode {mode!r}")
        quant = lambda w: quantize_weight_int4_g(w, group)

    def walk(node, path=""):
        if _is_linear_leaf(node):
            w = node["w"]
            # last-two-dims >= 128 excludes conv kernels (O, I, K_small) from
            # the (L, in, out) scan-stacked linear case
            keep = (w.ndim not in (2, 3) or w.size < min_size
                    or w.shape[-1] < min_dim or w.shape[-2] < min_dim
                    or (predicate is not None and not predicate(path, node)))
            if keep:
                return node
            q, scale = quant(w)
            out = {k: v for k, v in node.items() if k != "w"}
            if mode.startswith("int4"):
                # group mode is self-describing: the scale carries an extra
                # (in/group) axis, so no non-array metadata enters the pytree
                out["w_q4"], out["w_scale"] = q, scale
                return out
            out["w_q"], out["w_scale"] = q, scale
            return out
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, f"{path}.{i}") for i, v in enumerate(node))
        return node

    return walk(params)


def dequant_leaf(p, dtype=jnp.bfloat16):
    """Any quantized linear leaf ({"w_q"} int8/fp8 or {"w_q4"} packed int4,
    per-column or group scales) -> {"w": dtype, ...} full-precision leaf.

    This is the QLoRA-style training contract: the frozen base stays
    quantized in memory and is dequantized per use, so forward and backward
    run the SAME full-precision math (exact gradients, no straight-through
    estimator needed) while resident HBM stays at the packed size."""
    if "w_q4" in p:
        q = unpack_int4(p["w_q4"]).astype(jnp.float32)
        if p["w_scale"].ndim == p["w_q4"].ndim + 1:  # group scales
            in_dim, out_dim = q.shape[-2], q.shape[-1]
            groups = p["w_scale"].shape[-3]
            g = q.reshape(q.shape[:-2] + (groups, in_dim // groups, out_dim))
            w = (g * p["w_scale"]).reshape(q.shape)
        else:
            w = q * p["w_scale"]
    elif "w_q" in p:
        w = p["w_q"].astype(jnp.float32) * p["w_scale"]
    else:
        return p
    out = {k: v for k, v in p.items() if k not in ("w_q", "w_q4", "w_scale")}
    out["w"] = w.astype(dtype)
    return out


def dequantize_params(params, dtype=jnp.bfloat16):
    """Tree-walk inverse of quantize_params: every quantized linear leaf
    becomes a plain {"w", "b"} leaf in `dtype`. Use per block (not on a
    whole model) so the dequantized transient stays O(one block)."""
    def walk(node):
        if isinstance(node, dict):
            if "w_q" in node or "w_q4" in node:
                return dequant_leaf(node, dtype)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def quantized_fraction(params) -> float:
    """Diagnostic: fraction of linear-leaf elements running quantized."""
    q = n = 0

    def walk(node):
        nonlocal q, n
        if isinstance(node, dict):
            if "w_q" in node:
                q += node["w_q"].size
                n += node["w_q"].size
            elif _is_linear_leaf(node):
                n += node["w"].size
            else:
                for v in node.values():
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return q / max(n, 1)
