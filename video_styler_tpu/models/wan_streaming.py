"""Streaming executor for the Wan DiT: run models bigger than HBM.

This is the capability the reference's vram_management layer provides — the
fp8-quantized Wan-14B VACE edit runs on an 11 GB GPU by streaming every leaf
layer CPU->GPU per call (/root/reference/diffsynth/vram_management/
layers.py:95-188; recipe quoted at README.md:78). The TPU-native analog:

  * as many DiT blocks as fit the HBM budget stay RESIDENT on device
    (int8-quantized by default — the MXU runs int8 at 2x the bf16 rate, the
    like-for-like of the reference's fp8 path);
  * the remaining trunk blocks and the VACE branch live in host RAM and are
    PREFETCHED block-by-block with a multi-stream async device_put, double/
    triple-buffered so transfers overlap compute
    (parallel/streaming.py:MultiStreamLoader/PrefetchQueue);
  * VACE hint blocks are interleaved with the trunk walk: vace block i is
    computed right before its hint is injected after trunk layer
    vace_layers[i] (the hint chain c is independent of the trunk state, so
    this reorders nothing numerically — wan_video_vace.py:53-87), keeping a
    single (B, S, D) hint alive instead of all eight.

The forward mirrors the pipeline's jitted `full` fn for the flagship paths
(T2V/VACE/I2V + cfg_merge + TeaCache residual); exotic per-layer conditioning
(Animate, FunCamera, FunReference) stays on the resident path.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear
from ..ops.rope import assemble_freqs_grid
from ..parallel.streaming import (
    MultiStreamLoader, PrefetchQueue, host_quantize_int4, host_quantize_int8,
    pack_host_block, split_host_blocks, tree_bytes, tree_to_host,
)
from . import wan_dit as M
from .wan_dit import WanDiTConfig
from .wan_vace import VaceConfig


def _to_host_np(tree):
    """Accept device or host pytrees; land on numpy without device round-trips
    for leaves that are already host-side."""
    return jax.tree_util.tree_map(np.asarray, tree)


def _host_bf16(tree):
    """mode="bf16" cast: an f32 checkpoint must not silently stream and
    compute at twice the advertised bytes/FLOPs."""
    import ml_dtypes
    bf16 = ml_dtypes.bfloat16

    def cast(x):
        if x.dtype != bf16 and np.issubdtype(x.dtype, np.floating):
            return x.astype(bf16)
        return x
    return jax.tree_util.tree_map(cast, tree)


class WanBlockStreamer:
    """Host-resident Wan DiT (+ optional VACE branch) with streamed blocks.

    Parameters are split at construction:
      small (embeddings/head/modulation tables, vace patch+before_proj)
        -> always resident, kept in compute dtype;
      trunk blocks [0..R) -> resident stack (int8 when mode="int8");
      trunk blocks [R..N) and vace blocks -> host numpy, streamed per block.
    """

    def __init__(self, dit_params, cfg: WanDiTConfig,
                 vace_params=None, vace_cfg: Optional[VaceConfig] = None, *,
                 mode: str = "int8", hbm_budget_gb: float = 13.5,
                 activation_headroom_gb: float = 2.5,
                 resident_blocks: Optional[int] = None,
                 prefetch_depth: int = 3, num_streams: int = 8,
                 device=None, quant_min_size: int = 1 << 16,
                 quant_min_dim: int = 128, packed: bool = True,
                 overlap: bool = True):
        if mode not in ("int4", "int8", "bf16", "f32"):
            raise ValueError(f"unsupported streaming mode {mode!r}")
        # overlap=False: serial walk for links whose host->device DMA starves
        # under concurrent kernel execution (see PrefetchQueue gated mode) —
        # each transfer waits for the previous block's compute, trading the
        # (hidden-on-PCIe) overlap for full link bandwidth.
        self.overlap = overlap
        self.cfg = cfg
        self.vace_cfg = vace_cfg
        self.mode = mode
        self.device = device if device is not None else jax.devices()[0]
        self.loader = MultiStreamLoader(self.device, num_streams=num_streams)
        self.prefetch_depth = prefetch_depth
        self._jits: Dict[Any, Any] = {}

        quantize = {
            "int8": partial(host_quantize_int8, min_size=quant_min_size,
                            min_dim=quant_min_dim),
            "int4": partial(host_quantize_int4, min_size=quant_min_size,
                            min_dim=quant_min_dim),
            "bf16": _host_bf16,
            # "f32": stream the checkpoint dtype untouched (4 B/param for an
            # f32 checkpoint — twice bf16's traffic). This is the bit-exact
            # machinery-parity mode: with identical param values the walk
            # reproduces wan_dit_forward exactly, which the bf16 cast cannot
            # (jit-vs-eager rounding points differ at bf16 precision).
            "f32": lambda t: t}[mode]
        small = {k: v for k, v in dit_params.items() if k != "blocks"}
        if mode == "bf16":
            # the cast mode casts small too: small params drive t_mod/ctx/
            # tokens, and left at a checkpoint's f32 they promote the block
            # scan carry to f32 mid-walk (scan carry dtype error on chip)
            # and double the modulation FLOPs. Quantized/f32 modes keep the
            # checkpoint dtype — exact machinery parity with the resident
            # quantize_params path.
            small = _host_bf16(_to_host_np(small))
        blocks_host = _to_host_np(dit_params["blocks"])
        blocks_host = quantize(blocks_host)
        n = jax.tree_util.tree_leaves(blocks_host)[0].shape[0]
        self.num_layers = n
        per_block = tree_bytes(blocks_host) / n

        vace_small = None
        vace_blocks_host = None
        self.num_vace = 0
        if vace_params is not None:
            vace_small = {k: v for k, v in vace_params.items()
                          if k not in ("blocks", "after_proj")}
            if mode == "bf16":
                vace_small = _host_bf16(_to_host_np(vace_small))
            vace_blocks_host = _to_host_np(
                {"block": vace_params["blocks"],
                 "after": vace_params["after_proj"]})
            vace_blocks_host = quantize(vace_blocks_host)
            self.num_vace = len(vace_cfg.vace_layers)

        if resident_blocks is None:
            budget = (hbm_budget_gb - activation_headroom_gb) * 1e9
            budget -= tree_bytes(small) * 2  # small params + working copies
            # prefetch pipeline holds depth+1 blocks plus one concat transient
            budget -= (prefetch_depth + 2) * per_block
            resident_blocks = int(budget // per_block)
        # clamp EXPLICIT values too: resident_blocks > n would build a
        # resident segment no schedule position ever covers, and forward()
        # would silently skip the whole trunk (e.g. reusing a 14B
        # --resident value on the 1.3B config)
        resident_blocks = max(0, min(n, resident_blocks))
        self.resident_blocks = resident_blocks

        self.small = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, small), self.device)
        self.vace_small = None
        if vace_small is not None:
            self.vace_small = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, vace_small), self.device)

        # Resident blocks are stored PRE-SPLIT into the segments the vace-
        # interleaved walk actually runs ([bound, bound) between injection
        # points): forward never slices the stack on device, which would
        # transiently DOUBLE resident HBM (a [0:40) slice of the full 14B
        # int4 stack is an 8.6 GB copy — the round-3 OOM).
        bounds = [0, resident_blocks]
        if vace_cfg is not None:
            bounds += [j + 1 for j in vace_cfg.vace_layers
                       if 0 < j + 1 < resident_blocks]
        self._seg_bounds = sorted(set(b for b in bounds if b >= 0))
        # packed transfers: every host->device put of a block tree goes as
        # ONE contiguous buffer (the link's fixed per-put cost dominates
        # multi-leaf trees — see PackedBlock). The cache deduplicates the
        # slices of broadcast-aliased bench stores.
        pack_cache: Dict[Any, Any] = {}

        def _put1(tree):
            # the on-device unpack transiently holds input+output (the
            # input buffers are donated but can only be freed after their
            # last read) — fine for per-block trees, a 2x-HBM OOM for a
            # multi-GB resident segment. Big one-time uploads go unpacked.
            if packed and tree_bytes(tree) < (1 << 31):
                tree = pack_host_block(tree, cache=pack_cache)
            return self.loader.put(tree)

        self.resident_segs: List[Tuple[int, int, Any]] = []
        for a, b in zip(self._seg_bounds[:-1], self._seg_bounds[1:]):
            seg_host = jax.tree_util.tree_map(lambda x: x[a:b], blocks_host)
            self.resident_segs.append((a, b, _put1(seg_host).get()))
        self.streamed_host = split_host_blocks(blocks_host, resident_blocks, n)
        if packed:
            self.streamed_host = [pack_host_block(b, cache=pack_cache)
                                  for b in self.streamed_host]

        self.vace_resident_blocks = None
        self.vace_streamed_host = None
        if vace_blocks_host is not None:
            vace_bytes = tree_bytes(vace_blocks_host)
            spare = (hbm_budget_gb - activation_headroom_gb) * 1e9 \
                - (resident_blocks * per_block) - tree_bytes(small) * 2 \
                - (prefetch_depth + 2) * per_block
            if spare >= vace_bytes and resident_blocks == n:
                # per-block device trees: the walk uses one VACE block at a
                # time, so there is no reason to keep them stacked (slicing
                # a stacked tree on device copies)
                self.vace_resident_blocks = [
                    _put1(jax.tree_util.tree_map(
                        lambda x: x[i:i + 1], vace_blocks_host)).get()
                    for i in range(self.num_vace)]
            else:
                self.vace_streamed_host = split_host_blocks(
                    vace_blocks_host, 0, self.num_vace)
                if packed:
                    self.vace_streamed_host = [
                        pack_host_block(b, cache=pack_cache)
                        for b in self.vace_streamed_host]

    # ------------------------------------------------------------------
    # walk schedule
    # ------------------------------------------------------------------

    def build_schedule(self, use_vace: bool) -> List[Tuple[str, int]]:
        """Program-order streamed-item schedule: trunk block j at position
        j; vace block i right after trunk layer vace_layers[i]. Shared by
        forward() and StreamingTrainer so inference and training can never
        walk different schedules."""
        schedule: List[Tuple[str, int]] = []
        vace_layers = self.vace_cfg.vace_layers if use_vace else ()
        vi = 0
        for j in range(self.num_layers):
            schedule.append(("trunk", j))
            if vi < len(vace_layers) and vace_layers[vi] == j:
                schedule.append(("vace", vi))
                vi += 1
        return schedule

    # ------------------------------------------------------------------
    # jitted pieces (cached; shapes key the executables via jax.jit)
    # ------------------------------------------------------------------

    def _jit(self, name, fn, **kw):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn, **kw)
        return self._jits[name]

    def _embed(self, latents, timestep, context, clip_feature, y,
               rope_indices=None):
        cfg = self.cfg
        ri = None if rope_indices is None else np.asarray(rope_indices)
        key = ("embed", clip_feature is not None, y is not None,
               None if ri is None else tuple(ri.tolist()))
        if key not in self._jits:
            # bound the rope_indices-keyed executables: a keyframe-editing
            # session sweeping frame selections would otherwise accumulate
            # one compiled program (+ baked tables) per distinct tuple for
            # the streamer's lifetime
            if ri is not None:
                ri_keys = [k for k in self._jits
                           if isinstance(k, tuple) and k and k[0] == "embed"
                           and k[-1] is not None]
                if len(ri_keys) >= 16:
                    del self._jits[ri_keys[0]]
            def fn(small, latents, timestep, context, clip_feature, y):
                t, t_mod = M.time_embed(small, cfg, timestep)
                ctx = M.text_embed(small, context)
                if y is not None and cfg.require_vae_embedding:
                    latents = jnp.concatenate(
                        [latents, y.astype(latents.dtype)], axis=1)
                if clip_feature is not None and cfg.require_clip_embedding:
                    clip_emb = M.img_embed(small, clip_feature)
                    ctx = jnp.concatenate([clip_emb, ctx], axis=1)
                tokens, (f, h, w) = M.patchify(small["patch_embedding"],
                                               latents, cfg.patch_size)
                cos, sin = assemble_freqs_grid(cfg.head_dim, f, h, w, ri)
                return tokens, ctx, t, t_mod, cos, sin
            self._jits[key] = jax.jit(fn)
        tokens, ctx, t, t_mod, cos, sin = self._jits[key](
            self.small, latents, timestep, context, clip_feature, y)
        pt, ph, pw = cfg.patch_size
        grid = (latents.shape[2] // pt, latents.shape[3] // ph,
                latents.shape[4] // pw)
        return tokens, ctx, t, t_mod, cos, sin, grid

    def _vace_embed(self, vace_context, tokens):
        vcfg = self.vace_cfg

        def fn(vace_small, vace_context, tokens):
            c, _ = M.patchify(vace_small["patch_embedding"], vace_context,
                              vcfg.patch_size)
            s_x, s_c = tokens.shape[1], c.shape[1]
            if s_c < s_x:
                c = jnp.pad(c, ((0, 0), (0, s_x - s_c), (0, 0)))
            return linear(vace_small["before_proj"], c) + tokens

        return self._jit("vace_embed", fn)(self.vace_small, vace_context, tokens)

    def _run_block(self, block_p, x, ctx, t_mod, cos, sin):
        cfg = self.cfg

        def fn(block_p, x, ctx, t_mod, cos, sin):
            def scan_fn(carry, layer_p):
                return M.dit_block(layer_p, carry, ctx, t_mod, cos, sin, cfg), None
            x, _ = jax.lax.scan(scan_fn, x, block_p)
            return x

        return self._jit("block", fn, donate_argnums=(1,))(
            block_p, x, ctx, t_mod, cos, sin)

    def _run_vace_block(self, vb, c, ctx, t_mod, cos, sin):
        bcfg = self.vace_cfg.block_cfg()

        def fn(vb, c, ctx, t_mod, cos, sin):
            def scan_fn(carry, layer_p):
                carry = M.dit_block(layer_p["block"], carry, ctx, t_mod,
                                    cos, sin, bcfg)
                return carry, linear(layer_p["after"], carry)
            c, hints = jax.lax.scan(scan_fn, c, vb)
            return c, hints[0]

        return self._jit("vace_block", fn, donate_argnums=(1,))(
            vb, c, ctx, t_mod, cos, sin)

    def _force(self, x):
        """Materialize one element of a dispatched result — orders the host
        after device completion. (block_until_ready does not round-trip
        through remote-tunnel backends; one element costs one ~40 ms RTT.)"""
        np.asarray(x[(0,) * x.ndim])

    def _serial_sync(self, queue, out):
        """Serial-walk step: force `out`, then let the queue start the next
        transfer against the now-idle device. No-op in overlap mode."""
        if queue is not None and not self.overlap:
            self._force(out)
            queue.refill()

    def _inject(self, x, hint, scale):
        def fn(x, hint, scale):
            # keep x.dtype: a strong-f32 scale would promote the trunk
            return x + hint.astype(x.dtype) * scale.astype(x.dtype)
        return self._jit("inject", fn, donate_argnums=(0,))(x, hint, scale)

    def _head(self, x, t, grid):
        cfg = self.cfg

        def fn(small, x, t):
            out = M.head(small, cfg, x, t)
            return out

        out = self._jit("head", fn)(self.small, x, t)
        return M.unpatchify(out, grid, cfg.patch_size, cfg.out_dim)

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def forward(self, latents, timestep, context, vace_context=None,
                vace_scale=1.0, clip_feature=None, y=None,
                rope_indices=None, want_residual: bool = False):
        """Full DiT forward with streamed blocks.

        Matches wan_dit_forward / the pipeline `full` fn numerically
        (same per-block math; only the walk order of the independent VACE
        chain differs). Returns (velocity, t_mod, residual-or-None).
        """
        use_vace = vace_context is not None and self.vace_cfg is not None
        tokens, ctx, t, t_mod, cos, sin, grid = self._embed(
            latents, timestep, context, clip_feature, y, rope_indices)
        vace_scale = jnp.asarray(vace_scale, jnp.float32)

        c = self._vace_embed(vace_context, tokens) if use_vace else None
        # explicit copy: `tokens` itself is donated into the first block call
        tokens_pre = jnp.copy(tokens) if want_residual else None

        schedule = self.build_schedule(use_vace)

        host_items = []
        for kind, idx in schedule:
            if kind == "trunk" and idx >= self.resident_blocks:
                host_items.append(self.streamed_host[idx - self.resident_blocks])
            elif kind == "vace" and self.vace_streamed_host is not None:
                host_items.append(self.vace_streamed_host[idx])
        queue = (PrefetchQueue(host_items, self.loader, self.prefetch_depth,
                               gated=not self.overlap)
                 if host_items else None)

        x = tokens
        si = 0
        while si < len(schedule):
            kind, idx = schedule[si]
            if kind == "trunk" and idx < self.resident_blocks:
                # coalesce a contiguous resident run; execute it as the
                # pre-split segments it covers (no device-side slicing)
                start = idx
                while (si + 1 < len(schedule)
                       and schedule[si + 1][0] == "trunk"
                       and schedule[si + 1][1] < self.resident_blocks):
                    si += 1
                stop = schedule[si][1] + 1
                for a, b, seg in self.resident_segs:
                    if a >= start and b <= stop:
                        x = self._run_block(seg, x, ctx, t_mod, cos, sin)
            elif kind == "trunk":
                pending, block = queue.pop()
                x = self._run_block(block, x, ctx, t_mod, cos, sin)
                pending.delete()
                self._serial_sync(queue, x)
            else:  # vace
                if self.vace_resident_blocks is not None:
                    vb = self.vace_resident_blocks[idx]
                    c, hint = self._run_vace_block(vb, c, ctx, t_mod, cos, sin)
                else:
                    pending, vb = queue.pop()
                    c, hint = self._run_vace_block(vb, c, ctx, t_mod, cos, sin)
                    pending.delete()
                x = self._inject(x, hint, vace_scale)
                self._serial_sync(queue, x)
            si += 1

        residual = None
        if want_residual:
            residual = x - tokens_pre
        v = self._head(x, t, grid)
        return v, t_mod, residual

    def t_mod_only(self, timestep):
        """TeaCache probe (pipelines/wan_video.py TeaCache.check input)."""
        cfg = self.cfg

        def fn(small, timestep):
            _, t_mod = M.time_embed(small, cfg, timestep)
            return t_mod

        return self._jit("t_mod_only", fn)(self.small, timestep)

    def skip_forward(self, latents, timestep, context, residual, y=None):
        """TeaCache skip path: replay the cached trunk residual
        (wan_video_new.py:1418-1419,1455-1456) without touching the blocks."""
        cfg = self.cfg
        # `context` is accepted for signature parity with forward() but the
        # skip path never reads it — keep it out of the jitted call so it
        # neither transfers nor keys retraces on prompt shape
        del context
        key = ("skip", y is not None)
        if key not in self._jits:
            def fn(small, latents, timestep, residual, y):
                t, _ = M.time_embed(small, cfg, timestep)
                if y is not None and cfg.require_vae_embedding:
                    latents = jnp.concatenate(
                        [latents, y.astype(latents.dtype)], axis=1)
                tokens, (f, h, w) = M.patchify(small["patch_embedding"],
                                               latents, cfg.patch_size)
                tokens = tokens + residual
                out = M.head(small, cfg, tokens, t)
                return out
            self._jits[key] = jax.jit(fn)
        out = self._jits[key](self.small, latents, timestep, residual, y)
        pt, ph, pw = cfg.patch_size
        grid = (latents.shape[2] // pt, latents.shape[3] // ph,
                latents.shape[4] // pw)
        return M.unpatchify(out, grid, cfg.patch_size, cfg.out_dim)

    # diagnostics ------------------------------------------------------

    def resident_block(self, idx: int):
        """One trunk block (1, ...) from the pre-split resident segments."""
        for a, b, seg in self.resident_segs:
            if a <= idx < b:
                return M.slice_blocks(seg, idx - a, idx - a + 1)
        raise IndexError(f"block {idx} is not resident")

    def plan_summary(self) -> dict:
        streamed_bytes = sum(tree_bytes(b) for b in self.streamed_host)
        if self.vace_streamed_host is not None:
            streamed_bytes += sum(tree_bytes(b) for b in self.vace_streamed_host)
        resident_bytes = sum(tree_bytes(seg) for _, _, seg in
                             self.resident_segs)
        if self.vace_resident_blocks is not None:
            resident_bytes += sum(tree_bytes(b)
                                  for b in self.vace_resident_blocks)
        return {
            "mode": self.mode,
            "num_layers": self.num_layers,
            "resident_blocks": self.resident_blocks,
            "vace_resident": self.vace_resident_blocks is not None,
            "resident_gb": resident_bytes / 1e9,
            "streamed_gb_per_pass": streamed_bytes / 1e9,
        }
