"""Training with a streamed (bigger-than-HBM) trunk: LoRA on Wan+VACE.

The reference trains Wan-14B LoRA on commodity GPUs by combining per-block
gradient checkpointing with CPU activation offload
(vram_management/gradient_checkpointing.py:1-34 `save_on_cpu`, used from
pipelines/wan_video_new.py:1426-1440) and per-layer weight streaming. The
TPU-native equivalent here:

  * the frozen trunk's block weights live in host RAM and are streamed per
    block by the WanBlockStreamer machinery — forward AND again, in reverse
    order, for the backward; both walks prefetch through a PrefetchQueue
    (the walk order is known in advance), so transfers overlap compute;
  * boundary activations are checkpointed one of two ways:
      - activation_ckpt="device" (sqrt-checkpointing): every k-th (x, c)
        boundary stays in HBM; the reverse walk recomputes the per-block
        inputs segment by segment and runs the VACE backward interleaved.
        ZERO activation bytes cross the host link — on hosts with a slow
        device->host path this is the difference between a ~minute step
        and a ~20-minute one (the build host's tunnel reads back at
        ~15-20 MB/s while writing at ~95 MB/s; 48 boundaries x 290 MB
        made the offload variant entirely D2H-bound);
      - activation_ckpt="host": every boundary is offloaded to host RAM
        via copy_to_host_async (the save_on_cpu analog) and brought back
        one at a time in the reverse walk — O(1) activations in HBM, for
        batch/sequence sizes where the device stash cannot fit;
      - "auto" (default) picks "device" when the stash arithmetic fits
        `device_stash_budget_gb`, else "host";
  * each block's backward is an isolated jax.vjp that recomputes the block
    forward from its boundary input (per-block checkpointing) and yields
    the carry cotangent plus — for LoRA-targeted blocks — the A/B grads.
    With sub_remat=True (default) the block body puts each sublayer
    (self-attn / cross-attn / ffn) under its own jax.checkpoint, with the
    dequant+LoRA merge inside the stage: the vjp saves only the packed
    weights and three (B, S, D) carries, and the qkv/flash-workspace/fc1
    residuals exist for one sublayer at a time — this is what lets the
    device-checkpoint stash and the vjp coexist in 16 GB at the 14B shape.

Gradients flow only into LoRA factors (trainers/lora_train.py pytrees);
embeddings/head stay frozen, matching the reference recipe
(freeze_except + peft inject, trainers/utils.py:445-477; Ditto trains VACE
q,k,v,o,ffn rank 128 — train.sh:1-19).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import wan_dit as M
from ..models.wan_streaming import WanBlockStreamer
from ..ops.basic import linear
from ..parallel.streaming import PrefetchQueue
from .lora_train import apply_lora


def _slice_lora(lora: Optional[Dict], i: int):
    if lora is None:
        return None
    return {path: {"A": ab["A"][i:i + 1], "B": ab["B"][i:i + 1]}
            for path, ab in lora.items()}


def _block_with_lora(base_block, lora_slice, scale: float,
                     dtype=jnp.bfloat16):
    """Materialize W + scale*A@B on the (1, in, out) stacked slice.

    A quantized base (int8/fp8/int4 leaves from a WanBlockStreamer running
    in a quantized mode) is dequantized to `dtype` first — the QLoRA
    contract: the frozen base lives packed in HBM, each block dequantizes
    per use, and forward/backward run identical full-precision math (exact
    LoRA gradients, no straight-through estimator). The dequantized weights
    exist only as block-local transients inside the per-block jit."""
    from ..ops.quant import dequantize_params
    base_block = dequantize_params(base_block, dtype)
    if lora_slice is None:
        return base_block
    remap = {path.split(".", 1)[1]: ab for path, ab in lora_slice.items()
             if path.startswith("blocks.")}
    return apply_lora(base_block, remap, scale=scale)


def _sub_merge(base_sub, lora_slice, prefix: str, scale: float, dtype):
    """dequant + LoRA-merge ONE sublayer subtree (self_attn/cross_attn/ffn).

    Lives INSIDE a jax.checkpoint stage: the packed (quantized) weights are
    the saved residuals, the dequantized/merged bf16 weights are remat
    transients of that stage's backward. `lora_slice` carries the (1,...)
    stacked factors of this block; squeezed here because the merge happens
    on per-layer (unstacked) params."""
    from ..ops.quant import dequantize_params
    base_sub = dequantize_params(base_sub, dtype)
    if lora_slice is None:
        return base_sub
    remap = {}
    for path, ab in lora_slice.items():
        parts = path.split(".")              # "blocks.self_attn.q"
        if len(parts) >= 3 and parts[1] == prefix:
            remap[".".join(parts[2:])] = {"A": ab["A"][0], "B": ab["B"][0]}
    return apply_lora(base_sub, remap, scale) if remap else base_sub


def _dit_block_subremat(layer_p, lora_l, x, ctx, t_mod, cos, sin, cfg,
                        scale: float):
    """dit_block with each sublayer under jax.checkpoint, for the streamed
    backward: the block vjp saves only the packed weights + three (B, S, D)
    carries; qkv tensors, the flash-attention workspace, the fc1/gelu
    activations and the dequantized weights exist for ONE sublayer at a
    time during the backward. Cuts the per-block vjp peak ~2-3x at the 14B
    shape — the term that decides whether the device-checkpointed reverse
    walk fits HBM next to the boundary stash."""
    s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = \
        M._split_mod(layer_p["modulation"], t_mod, 6)

    @jax.checkpoint
    def sa(p_sa, lora_l, x, s0, s1, g):
        p_sa = _sub_merge(p_sa, lora_l, "self_attn", scale, x.dtype)
        h = M.modulate(M.layer_norm({}, x, cfg.eps), s0, s1)
        return x + g * M.self_attention(p_sa, h, cos, sin, cfg.num_heads,
                                        cfg.eps)

    @jax.checkpoint
    def ca(p_ca, norm3, lora_l, x):
        p_ca = _sub_merge(p_ca, lora_l, "cross_attn", scale, x.dtype)
        return x + M.cross_attention(p_ca, M.layer_norm(norm3, x, cfg.eps),
                                     ctx, cfg.num_heads, cfg.eps,
                                     cfg.has_image_input)

    @jax.checkpoint
    def ff(p_ffn, lora_l, x, s0, s1, g):
        p_ffn = _sub_merge(p_ffn, lora_l, "ffn", scale, x.dtype)
        h = M.modulate(M.layer_norm({}, x, cfg.eps), s0, s1)
        return x + g * M.ffn(p_ffn, h)

    x = sa(layer_p["self_attn"], lora_l, x, s_msa, sc_msa, g_msa)
    x = ca(layer_p["cross_attn"], layer_p["norm3"], lora_l, x)
    return ff(layer_p["ffn"], lora_l, x, s_mlp, sc_mlp, g_mlp)


def _per_layer(block_p):
    """Iterate per-layer slices of a (L, ...) stacked block tree."""
    L = jax.tree_util.tree_leaves(block_p)[0].shape[0]
    for l in range(L):
        yield jax.tree_util.tree_map(lambda a: a[l], block_p)


def _vace_with_lora(vb, lora_slice, scale: float, dtype=jnp.bfloat16):
    """Same as _block_with_lora for a {"block", "after"} VACE slice."""
    from ..ops.quant import dequantize_params
    vb = dequantize_params(vb, dtype)
    if lora_slice is None:
        return vb
    inner = {path.split(".", 1)[1]: ab for path, ab in lora_slice.items()
             if path.startswith("blocks.")}
    out = dict(vb)
    out["block"] = apply_lora(vb["block"], inner, scale)
    return out


class StreamingTrainer:
    """LoRA training step over a streamed trunk (+ optional VACE branch).

    trunk LoRA paths: "blocks.<...>"; vace LoRA paths: "blocks.<...>" in
    `vace_lora` (the VACE stack has its own block tree)."""

    def __init__(self, streamer: WanBlockStreamer, lora_scale: float = 1.0,
                 activation_ckpt: str = "auto",
                 segment: Optional[int] = None,
                 device_stash_budget_gb: float = 8.0,
                 sub_remat: bool = True):
        if activation_ckpt not in ("auto", "device", "host"):
            raise ValueError(f"unknown activation_ckpt {activation_ckpt!r}")
        self.s = streamer
        self.scale = lora_scale
        self.activation_ckpt = activation_ckpt
        self.segment = segment
        self.device_stash_budget = device_stash_budget_gb * 1e9
        self.sub_remat = sub_remat
        self._jits = {}

    # ---------------- jitted pieces ----------------

    def _jit(self, name, fn, **kw):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn, **kw)
        return self._jits[name]

    def _block_fwd(self, block_p, lora_i, x, ctx, t_mod, cos, sin):
        cfg = self.s.cfg

        def fn(block_p, lora_i, x, ctx, t_mod, cos, sin):
            bp = _block_with_lora(block_p, lora_i, self.scale, x.dtype)

            def scan_fn(carry, layer_p):
                return M.dit_block(layer_p, carry, ctx, t_mod, cos, sin,
                                   cfg), None
            x, _ = jax.lax.scan(scan_fn, x, bp)
            return x

        key = ("bf", lora_i is not None)
        return self._jit(key, fn)(block_p, lora_i, x, ctx, t_mod, cos, sin)

    def _block_bwd(self, block_p, lora_i, x_in, ctx, t_mod, cos, sin, dx):
        """Recompute-and-vjp one trunk block: returns (dx_in, dlora_i)."""
        cfg = self.s.cfg
        has_lora = lora_i is not None
        sub = self.sub_remat

        def fn(block_p, lora_i, x_in, ctx, t_mod, cos, sin, dx):
            def block(lora_i, x):
                if sub:
                    for layer_p in _per_layer(block_p):
                        x = _dit_block_subremat(layer_p, lora_i, x, ctx,
                                                t_mod, cos, sin, cfg,
                                                self.scale)
                    return x
                bp = _block_with_lora(block_p, lora_i, self.scale, x.dtype)

                def scan_fn(carry, layer_p):
                    return M.dit_block(layer_p, carry, ctx, t_mod, cos, sin,
                                       cfg), None
                x, _ = jax.lax.scan(scan_fn, x, bp)
                return x

            if has_lora:
                _, vjp = jax.vjp(block, lora_i, x_in)
                dlora, dx_in = vjp(dx)
            else:
                _, vjp = jax.vjp(lambda x: block(None, x), x_in)
                (dx_in,) = vjp(dx)
                dlora = None
            return dx_in, dlora

        key = ("bb", has_lora, sub)
        return self._jit(key, fn)(block_p, lora_i, x_in, ctx, t_mod, cos,
                                  sin, dx)

    def _vace_bwd(self, vb, lora_i, c_in, ctx, t_mod, cos, sin, d_c, d_hint):
        bcfg = self.s.vace_cfg.block_cfg()
        has_lora = lora_i is not None
        sub = self.sub_remat

        def fn(vb, lora_i, c_in, ctx, t_mod, cos, sin, d_c, d_hint):
            @jax.checkpoint
            def after(p_af, c):
                from ..ops.quant import dequantize_params
                return linear(dequantize_params(p_af, c.dtype), c)

            def block(lora_i, c):
                if sub:
                    hint = None
                    for layer_p in _per_layer(vb):
                        c = _dit_block_subremat(layer_p["block"], lora_i, c,
                                                ctx, t_mod, cos, sin, bcfg,
                                                self.scale)
                        if hint is None:  # scan-form parity: layer-0 hint
                            hint = after(layer_p["after"], c)
                    return c, hint
                bp = _vace_with_lora(vb, lora_i, self.scale, c.dtype)

                def scan_fn(carry, layer_p):
                    carry = M.dit_block(layer_p["block"], carry, ctx, t_mod,
                                        cos, sin, bcfg)
                    return carry, linear(layer_p["after"], carry)
                c, hints = jax.lax.scan(scan_fn, c, bp)
                return c, hints[0]

            if has_lora:
                _, vjp = jax.vjp(block, lora_i, c_in)
                dlora, dc_in = vjp((d_c, d_hint))
            else:
                _, vjp = jax.vjp(lambda c: block(None, c), c_in)
                (dc_in,) = vjp((d_c, d_hint))
                dlora = None
            return dc_in, dlora

        key = ("vb", has_lora, sub)
        return self._jit(key, fn)(vb, lora_i, c_in, ctx, t_mod, cos, sin,
                                  d_c, d_hint)

    def _head_loss(self, x, t, grid, target, weight):
        cfg = self.s.cfg

        def fn(small, x, t, target, weight):
            out = M.head(small, cfg, x, t)
            v = M.unpatchify(out, grid, cfg.patch_size, cfg.out_dim)
            err = (v.astype(jnp.float32) - target.astype(jnp.float32))
            return jnp.mean(jnp.square(err)) * weight

        key = ("hl", grid)
        if key not in self._jits:
            self._jits[key] = jax.jit(jax.value_and_grad(fn, argnums=1))
        return self._jits[key](self.s.small, x, t, target, weight)

    # ---------------- the step ----------------

    def loss_and_grads(self, latents_noisy, timestep, context, target,
                       vace_context=None, vace_scale: float = 1.0,
                       trunk_lora: Optional[Dict] = None,
                       vace_lora: Optional[Dict] = None,
                       loss_weight: float = 1.0):
        """-> (loss, trunk_lora_grads, vace_lora_grads).

        Flow-match MSE against `target` (training_loss contract,
        wan_video_new.py:108-121; target = noise - latents with the
        scheduler's timestep weighting folded into loss_weight)."""
        s = self.s
        use_vace = vace_context is not None and s.vace_cfg is not None
        # the VACE chain carries gradient only into VACE LoRA factors (its
        # other inputs — vace_context, tokens, frozen weights — are not
        # trained), so with vace_lora=None its backward would re-stream and
        # recompute every VACE block for nothing
        bwd_vace = use_vace and vace_lora is not None
        tokens, ctx, t, t_mod, cos, sin, grid = s._embed(
            latents_noisy, timestep, context, None, None)
        vace_scale = jnp.asarray(vace_scale, jnp.float32)

        c = s._vace_embed(vace_context, tokens) if use_vace else None

        schedule = s.build_schedule(use_vace)
        need_bwd = trunk_lora is not None or vace_lora is not None
        ckpt, seg_k = self._pick_ckpt(schedule, tokens, c)

        fwd_queue = self._make_queue(
            kind_filter=lambda kind, idx: (
                (kind == "trunk" and idx >= s.resident_blocks)
                or (kind == "vace" and s.vace_streamed_host is not None)),
            order=schedule)

        # ---------- forward ------------------------------------------------
        # "device": keep every seg_k-th (x, c) boundary in HBM.
        # "host": offload EVERY boundary, async (copy_to_host_async first,
        # materialize once a newer boundary is in flight).
        saved: Dict[int, Tuple] = {}          # device mode: si -> (x, c)
        stash: Dict[int, np.ndarray] = {}     # host mode: si -> numpy
        in_flight: list = []                  # host mode: [(si, dev array)]

        def _stash(si, arr):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
            in_flight.append((si, arr))

        def _drain(limit: int):
            while len(in_flight) > limit:
                psi, arr = in_flight.pop(0)
                stash[psi] = np.asarray(arr)

        x = tokens
        for si, (kind, idx) in enumerate(schedule):
            if need_bwd and ckpt == "device" and si % seg_k == 0:
                saved[si] = (x, c)
            if kind == "trunk":
                if need_bwd and ckpt == "host":
                    _stash(si, x)
                bp, pending = self._next_block(kind, idx, fwd_queue)
                x = self._block_fwd(bp, _slice_lora(trunk_lora, idx), x,
                                    ctx, t_mod, cos, sin)
            else:
                if bwd_vace and ckpt == "host":
                    _stash(si, c)
                vb, pending = self._next_block(kind, idx, fwd_queue)
                c, hint = self._vace_fwd(vb, _slice_lora(vace_lora, idx),
                                         c, ctx, t_mod, cos, sin)
                x = x + hint.astype(x.dtype) * vace_scale.astype(x.dtype)
            if pending is not None:
                pending.delete()
            s._serial_sync(fwd_queue, x)
            _drain(1)
        _drain(0)

        loss, dx = self._head_loss(x, t, grid, target,
                                   jnp.asarray(loss_weight, jnp.float32))
        if not need_bwd:
            return loss, None, None

        trunk_grads = {} if trunk_lora is not None else None
        vace_grads = {} if vace_lora is not None else None

        if ckpt == "device":
            self._reverse_device(schedule, seg_k, saved, dx,
                                 trunk_lora, vace_lora, bwd_vace, c,
                                 ctx, t_mod, cos, sin, vace_scale,
                                 trunk_grads, vace_grads)
            return (loss,
                    _restack(trunk_grads, trunk_lora),
                    _restack(vace_grads, vace_lora))

        # ---------- host-mode reverse: re-stream params, restore, vjp ------
        rev_trunk = [("trunk", idx) for kind, idx in reversed(schedule)
                     if kind == "trunk"]
        bwd_queue = self._make_queue(
            kind_filter=lambda kind, idx: idx >= s.resident_blocks,
            order=rev_trunk)
        d_hints: Dict[int, jnp.ndarray] = {}
        for si in reversed(range(len(schedule))):
            kind, idx = schedule[si]
            if kind == "vace":
                if bwd_vace:
                    d_hints[idx] = dx * vace_scale.astype(dx.dtype)
                continue
            bp, pending = self._next_block(kind, idx, bwd_queue)
            x_in = jnp.asarray(stash[si])
            dx, dlora = self._block_bwd(bp, _slice_lora(trunk_lora, idx),
                                        x_in, ctx, t_mod, cos, sin, dx)
            if pending is not None:
                pending.delete()
            s._serial_sync(bwd_queue, dx)
            if dlora is not None:
                trunk_grads[idx] = dlora
            del stash[si]

        if bwd_vace:
            d_c = jnp.zeros_like(c)
            vace_sis = [si for si, (k, _) in enumerate(schedule)
                        if k == "vace"]
            n_vace = len(vace_sis)
            vrev_queue = None
            if s.vace_streamed_host is not None:
                vrev_queue = PrefetchQueue(
                    [s.vace_streamed_host[i]
                     for i in reversed(range(n_vace))],
                    s.loader, s.prefetch_depth)
            for i in reversed(range(n_vace)):
                vb, pending = self._next_block("vace", i, vrev_queue)
                c_in = jnp.asarray(stash[vace_sis[i]])
                d_c, dlora = self._vace_bwd(vb, _slice_lora(vace_lora, i),
                                            c_in, ctx, t_mod, cos, sin,
                                            d_c, d_hints[i].astype(d_c.dtype))
                if pending is not None:
                    pending.delete()
                s._serial_sync(vrev_queue, d_c)
                if dlora is not None:
                    vace_grads[i] = dlora

        return (loss,
                _restack(trunk_grads, trunk_lora),
                _restack(vace_grads, vace_lora))

    # ---------------- activation checkpointing ----------------

    def _pick_ckpt(self, schedule, tokens, c):
        """-> ("device"|"host", segment size k).

        "device" keeps ceil(n/k) (x, c) boundary pairs + one segment of
        recomputed inputs + the segment's reused weights in HBM; picked
        automatically when that arithmetic fits device_stash_budget_gb."""
        k = self.segment or max(1, int(math.ceil(math.sqrt(len(schedule)))))
        if self.activation_ckpt != "auto":
            return self.activation_ckpt, k
        from ..parallel.streaming import tree_bytes
        xb = tokens.size * tokens.dtype.itemsize
        cb = 0 if c is None else c.size * c.dtype.itemsize
        n_bound = math.ceil(len(schedule) / k)
        per_block = (tree_bytes(self.s.streamed_host[0])
                     if self.s.streamed_host else 0)
        need = (n_bound * (xb + cb) + k * max(xb, cb)
                + (k + self.s.prefetch_depth + 1) * per_block)
        return ("device" if need <= self.device_stash_budget else "host"), k

    def _reverse_device(self, schedule, seg_k, saved, dx,
                        trunk_lora, vace_lora, bwd_vace, c_final,
                        ctx, t_mod, cos, sin, vace_scale,
                        trunk_grads, vace_grads):
        """Segment-wise reverse walk over device-resident boundaries.

        Per segment (in reverse): re-stream its weights once, recompute the
        per-item inputs forward from the saved (x, c) boundary, then vjp the
        items in reverse — the VACE backward interleaves into the walk (the
        hint cotangent dx*scale is exactly the carry dx when the reverse
        passes the injection point), so no c stash outlives its segment."""
        s = self.s
        seg_starts = list(range(0, len(schedule), seg_k))
        rev_order = []
        for s0 in reversed(seg_starts):
            rev_order.extend(schedule[s0:s0 + seg_k])
        bwd_queue = self._make_queue(
            kind_filter=lambda kind, idx: (
                (kind == "trunk" and idx >= s.resident_blocks)
                or (kind == "vace" and s.vace_streamed_host is not None)),
            order=rev_order)
        d_c = jnp.zeros_like(c_final) if bwd_vace else None
        for s0 in reversed(seg_starts):
            seg_items = schedule[s0:s0 + seg_k]
            x_r, c_r = saved.pop(s0)
            inputs, seg_blocks = [], []
            last = len(seg_items) - 1
            for j, (kind, idx) in enumerate(seg_items):
                # weights fetched ONCE per segment, reused by the vjp below
                bp, pending = self._next_block(kind, idx, bwd_queue)
                seg_blocks.append((bp, pending))
                if kind == "trunk":
                    inputs.append(x_r)
                    if j < last:  # the last item's output is never used
                        x_r = self._block_fwd(
                            bp, _slice_lora(trunk_lora, idx), x_r,
                            ctx, t_mod, cos, sin)
                        s._serial_sync(bwd_queue, x_r)
                else:
                    inputs.append(c_r)
                    if j < last:
                        c_r, hint = self._vace_fwd(
                            bp, _slice_lora(vace_lora, idx), c_r,
                            ctx, t_mod, cos, sin)
                        x_r = x_r + hint.astype(x_r.dtype) * \
                            vace_scale.astype(x_r.dtype)
                        s._serial_sync(bwd_queue, x_r)
            x_r = c_r = None
            for j in reversed(range(len(seg_items))):
                kind, idx = seg_items[j]
                bp, pending = seg_blocks[j]
                if kind == "vace":
                    if bwd_vace:
                        d_hint = dx * vace_scale.astype(dx.dtype)
                        d_c, dlora = self._vace_bwd(
                            bp, _slice_lora(vace_lora, idx), inputs[j],
                            ctx, t_mod, cos, sin, d_c,
                            d_hint.astype(d_c.dtype))
                        if dlora is not None:
                            vace_grads[idx] = dlora
                else:
                    dx, dlora = self._block_bwd(
                        bp, _slice_lora(trunk_lora, idx), inputs[j],
                        ctx, t_mod, cos, sin, dx)
                    if dlora is not None:
                        trunk_grads[idx] = dlora
                if pending is not None:
                    pending.delete()
                s._serial_sync(bwd_queue,
                               dx if (kind == "trunk" or d_c is None) else d_c)
                inputs[j] = None
                seg_blocks[j] = (None, None)

    # ---------------- param access (resident or streamed) ----------------

    def _make_queue(self, kind_filter, order):
        """PrefetchQueue over the streamed host blocks a walk will consume,
        in exactly that order — transfers overlap block compute instead of
        the blocking per-block put the first version of this trainer used."""
        s = self.s
        host_items = []
        for kind, idx in order:
            if not kind_filter(kind, idx):
                continue
            if kind == "trunk":
                host_items.append(s.streamed_host[idx - s.resident_blocks])
            else:
                host_items.append(s.vace_streamed_host[idx])
        if not host_items:
            return None
        return PrefetchQueue(host_items, s.loader, s.prefetch_depth,
                             gated=not s.overlap)

    def _next_block(self, kind, idx, queue):
        """-> (device block tree, pending-or-None). Resident blocks come
        from the streamer's pre-split segments; streamed ones pop the
        walk's prefetch queue (caller deletes the pending after use)."""
        s = self.s
        if kind == "trunk":
            if idx < s.resident_blocks:
                return s.resident_block(idx), None
        elif s.vace_resident_blocks is not None:
            return s.vace_resident_blocks[idx], None
        pending, tree = queue.pop()
        return tree, pending

    def _vace_fwd(self, vb, lora_i, c, ctx, t_mod, cos, sin):
        bcfg = self.s.vace_cfg.block_cfg()

        def fn(vb, lora_i, c, ctx, t_mod, cos, sin):
            bp = _vace_with_lora(vb, lora_i, self.scale, c.dtype)

            def scan_fn(carry, layer_p):
                carry = M.dit_block(layer_p["block"], carry, ctx, t_mod,
                                    cos, sin, bcfg)
                return carry, linear(layer_p["after"], carry)
            c, hints = jax.lax.scan(scan_fn, c, bp)
            return c, hints[0]

        key = ("vf", lora_i is not None)
        return self._jit(key, fn)(vb, lora_i, c, ctx, t_mod, cos, sin)


def _restack(grads: Optional[Dict[int, Dict]], lora: Optional[Dict]):
    """Per-block grad slices -> stacked pytree matching the LoRA layout,
    zero where a block had no grad contribution."""
    if grads is None or lora is None:
        return None
    out = {}
    for path, ab in lora.items():
        A = np.zeros(ab["A"].shape, np.float32)
        B = np.zeros(ab["B"].shape, np.float32)
        for i, g in grads.items():
            A[i] = np.asarray(g[path]["A"][0], np.float32)
            B[i] = np.asarray(g[path]["B"][0], np.float32)
        out[path] = {"A": jnp.asarray(A, ab["A"].dtype),
                     "B": jnp.asarray(B, ab["B"].dtype)}
    return out
