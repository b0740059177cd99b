"""Host-resident parameter streaming — the TPU analog of vram_management.

The reference runs Wan-14B on an 11 GB GPU by wrapping every leaf layer in a
3-state onload/offload FSM that copies weights CPU->GPU per call
(/root/reference/diffsynth/vram_management/layers.py:95-188, per-model maps at
pipelines/wan_video_new.py:124-310). The TPU-native equivalent implemented
here works at DiT-block granularity over scan-stacked param pytrees:

  * a block stack is split into a device-RESIDENT prefix (optionally
    int8-quantized so more blocks fit HBM) and a host-resident remainder
    kept as numpy arrays;
  * during a forward pass the host blocks are prefetched ahead of compute
    with a multi-stream async `jax.device_put` (PrefetchQueue), so the
    transfer of block i+1..i+depth overlaps block i's compute;
  * streamed device buffers are dropped (`.delete()`) as soon as their
    block finishes, keeping the streamed working set at `depth` blocks.

Multi-stream transfer matters: one `device_put` stream measures ~0.25 GB/s
on this host link while 8 concurrent streams aggregate ~1.3 GB/s (probed in
tools/probe_transfer.py); leaves larger than `chunk_bytes` are split along
their leading (stacked-layer) axis and reassembled on device.
"""
from __future__ import annotations

import math
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "tree_bytes", "tree_to_host", "host_quantize_int8", "host_quantize_int4",
    "MultiStreamLoader", "PackedBlock", "pack_host_block",
    "PrefetchQueue", "split_host_blocks",
]


def tree_bytes(tree) -> int:
    if isinstance(tree, PackedBlock):
        return sum(b.nbytes for b in tree.bufs.values())
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def tree_to_host(tree):
    """Device pytree -> numpy pytree (single bulk device->host transfer each)."""
    return jax.tree_util.tree_map(np.asarray, tree)


def host_quantize_int8(tree, min_size: int = 1 << 16, min_dim: int = 128):
    """Numpy mirror of ops.quant.quantize_params (int8 mode) for host stores.

    Rewrites linear leaves {"w": ...} into {"w_q", "w_scale"} with
    per-output-channel absmax scales, without touching the device.
    """
    def is_linear(node):
        return (isinstance(node, dict) and "w" in node
                and not isinstance(node["w"], dict)
                and getattr(node["w"], "ndim", 0) >= 2)

    def walk(node):
        if is_linear(node):
            w = np.asarray(node["w"])
            if (w.ndim not in (2, 3) or w.size < min_size
                    or w.shape[-1] < min_dim or w.shape[-2] < min_dim):
                return node
            wf = w.astype(np.float32)
            scale = np.maximum(np.abs(wf).max(axis=-2, keepdims=True) / 127.0, 1e-8)
            q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
            out = {k: v for k, v in node.items() if k != "w"}
            out["w_q"], out["w_scale"] = q, scale.astype(np.float32)
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(tree)


def host_quantize_int4(tree, min_size: int = 1 << 16, min_dim: int = 128):
    """Numpy mirror of ops.quant.quantize_params (int4 mode, per-column
    scales): linear leaves become {"w_q4" packed nibbles, "w_scale"} at
    0.5 byte/param — halves the resident HBM of int8, which is what lets
    the full Wan-14B+VACE stack sit on one 16 GB v5e with no per-pass
    streaming (ops/quant.py:quantize_weight_int4)."""
    def is_linear(node):
        return (isinstance(node, dict) and "w" in node
                and not isinstance(node["w"], dict)
                and getattr(node["w"], "ndim", 0) >= 2)

    def walk(node):
        if is_linear(node):
            w = np.asarray(node["w"])
            if (w.ndim not in (2, 3) or w.size < min_size
                    or w.shape[-1] < min_dim or w.shape[-2] < min_dim):
                return node
            wf = w.astype(np.float32)
            scale = np.maximum(np.abs(wf).max(axis=-2, keepdims=True) / 7.0,
                               1e-8)
            q = np.clip(np.round(wf / scale), -7, 7).astype(np.int8)
            lo, hi = q[..., 0::2, :], q[..., 1::2, :]
            out = {k: v for k, v in node.items() if k != "w"}
            out["w_q4"] = ((lo & 0x0F) | (hi << 4)).astype(np.int8)
            out["w_scale"] = scale.astype(np.float32)
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(tree)


def split_host_blocks(stacked_host, start: int, stop: int) -> List[Any]:
    """Stacked host pytree -> per-block host pytrees for blocks [start, stop).

    Slices keep a leading axis of length 1 so the same scan-shaped apply
    functions work on both resident stacks and streamed single blocks.
    """
    def slice1(x, i):
        seg = x[i:i + 1]
        # broadcast-aliased stores (bench alias mode) slice to views that
        # are already C-contiguous; copying would defeat the aliasing
        return seg if seg.flags["C_CONTIGUOUS"] else np.ascontiguousarray(seg)

    out = []
    for i in range(start, stop):
        out.append(jax.tree_util.tree_map(lambda x: slice1(x, i), stacked_host))
    return out


class PackedBlock:
    """A host param pytree coalesced into one flat 1-D buffer PER DTYPE.

    The tunnel/PCIe link pays a fixed per-`device_put` cost that dominates
    multi-leaf block trees (measured on this host: a 352 MB / 37-leaf int8
    block moves at ~57 MB/s leaf-by-leaf but ~390 MB/s coalesced —
    tools/probe_put_latency.py; concurrent streams HURT on the current
    tunnel). Packing transfers each block as one put per distinct dtype
    (int8 payload / f32 scales / bf16 bias -> 3 puts instead of 37) and
    unpacks on device with a jitted 1-D slice + reshape per leaf.

    Per-dtype — not one uint8 blob — for two load-bearing reasons:
      * unpacking a uint8 blob needs bitcast_convert_type through an
        (N, itemsize) intermediate, and the TPU tile-pads that trailing
        dim 4 to 128: a 0.9 GB f32 group inflates to a 28 GB allocation
        at compile time (observed OOM on the 14B resident segment).
        1-D slices of a same-dtype buffer need no bitcast and no padding.
      * the wire compresses typed streams differently (bf16 weight
        streams move ~3x faster than incompressible int8 here); mixing
        dtypes into one blob destroys that.
    """

    __slots__ = ("bufs", "treedef", "spec")

    def __init__(self, bufs: Dict[str, np.ndarray], treedef, spec: Tuple):
        self.bufs = bufs        # {dtype_str: flat 1-D np array}
        self.treedef = treedef
        self.spec = spec        # ((dtype_str, offset_elems, shape), ...)


def pack_host_block(tree, cache: Optional[Dict] = None) -> PackedBlock:
    """Flatten a host pytree into a PackedBlock.

    `cache` deduplicates by underlying data pointers: block slices of a
    broadcast-aliased host store (bench alias mode) all map to the SAME
    physical bytes, and packing each of the 40 aliased slices would
    otherwise materialize 40 real copies through this VM's ~10 MB/s
    first-touch pages."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    leaves = [np.asarray(x) for x in leaves]
    if cache is not None:
        key = tuple((x.__array_interface__["data"][0], x.shape, str(x.dtype))
                    for x in leaves)
        hit = cache.get(key)
        if hit is not None:
            return hit
    offs: Dict[str, int] = {}
    spec = []
    for x in leaves:
        dt = str(x.dtype)
        off = offs.get(dt, 0)
        spec.append((dt, off, x.shape))
        offs[dt] = off + x.size
    bufs = {dt: np.empty(n, np.dtype(dt)) for dt, n in offs.items()}
    for x, (dt, off, _) in zip(leaves, spec):
        bufs[dt][off:off + x.size] = np.ascontiguousarray(x).reshape(-1)
    out = PackedBlock(bufs, treedef, tuple(spec))
    if cache is not None:
        cache[key] = out
    return out


_UNPACK_JITS: Dict[Tuple, Any] = {}


def _unpack_fn(treedef, spec, buf_dtypes: Tuple[str, ...]):
    key = (treedef, spec, buf_dtypes)
    if key not in _UNPACK_JITS:
        def unpack(*flat_bufs):
            bufs = dict(zip(buf_dtypes, flat_bufs))
            leaves = []
            for dt, off, shape in spec:
                n = 1
                for s in shape:
                    n *= s
                leaves.append(
                    jax.lax.slice(bufs[dt], (off,), (off + n,)).reshape(shape))
            return jax.tree_util.tree_unflatten(treedef, leaves)
        # donate the flat buffers: the unpack is a relayout copy and the
        # inputs are dead after it — without donation the block transiently
        # costs 2x its HBM footprint
        _UNPACK_JITS[key] = jax.jit(
            unpack, donate_argnums=tuple(range(len(buf_dtypes))))
    return _UNPACK_JITS[key]


class MultiStreamLoader:
    """Async host->device pytree transfer over a thread pool.

    `put(tree)` returns a PendingTree; `.get()` blocks until every leaf is on
    device. Leaves above `chunk_bytes` are split along axis 0 (when it has
    more than one element) and concatenated back on device. A PackedBlock
    transfers as ONE device_put and unpacks on device at `.get()`.
    """

    def __init__(self, device=None, num_streams: int = 8,
                 chunk_bytes: int = 96 << 20):
        self.device = device if device is not None else jax.devices()[0]
        self.pool = ThreadPoolExecutor(max_workers=num_streams)
        self.chunk_bytes = chunk_bytes

    def _put_leaf(self, leaf) -> Tuple[str, List[Future]]:
        nbytes = leaf.size * leaf.dtype.itemsize
        if leaf.ndim >= 1 and leaf.shape[0] > 1 and nbytes > self.chunk_bytes:
            n_chunks = min(leaf.shape[0], math.ceil(nbytes / self.chunk_bytes))
            parts = np.array_split(leaf, n_chunks, axis=0)
            return "concat", [self.pool.submit(jax.device_put, p, self.device)
                              for p in parts]
        return "whole", [self.pool.submit(jax.device_put, leaf, self.device)]

    def put(self, tree) -> "PendingTree":
        if isinstance(tree, PackedBlock):
            dts = tuple(tree.bufs.keys())
            futs = [self.pool.submit(jax.device_put, tree.bufs[dt],
                                     self.device) for dt in dts]
            return PendingTree(tree.treedef, [("packed", futs)],
                               spec=tree.spec, buf_dtypes=dts)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        pending = [self._put_leaf(np.asarray(x)) for x in leaves]
        return PendingTree(treedef, pending)


class PendingTree:
    def __init__(self, treedef, pending, spec=None, buf_dtypes=None):
        self.treedef = treedef
        self.pending = pending
        self.spec = spec
        self.buf_dtypes = buf_dtypes
        self._raw = None
        self._result = None

    def get(self):
        if self._result is None:
            if self.spec is not None:
                self._raw = [f.result() for f in self.pending[0][1]]
                self._result = _unpack_fn(
                    self.treedef, self.spec, self.buf_dtypes)(*self._raw)
            else:
                leaves = []
                for kind, futs in self.pending:
                    parts = [f.result() for f in futs]
                    leaves.append(parts[0] if kind == "whole"
                                  else jnp.concatenate(parts, axis=0))
                self._result = jax.tree_util.tree_unflatten(self.treedef,
                                                            leaves)
            self.pending = None
        return self._result

    def delete(self):
        """Free the device buffers (safe once the consuming computation has
        been dispatched — jax keeps buffers alive until executed use)."""
        if self._result is not None:
            for x in jax.tree_util.tree_leaves(self._result):
                try:
                    x.delete()
                except Exception:
                    pass
            self._result = None
        if self._raw is not None:
            for r in self._raw:
                try:
                    r.delete()  # no-op post-get: donated into the unpack
                except Exception:
                    pass
            self._raw = None


class PrefetchQueue:
    """Keeps `depth` upcoming host pytrees in flight on a MultiStreamLoader.

    Items are consumed strictly in the order of `host_items`; `pop()` returns
    the device pytree for the next item and tops the pipeline back up.

    gated=True is the SERIAL-link mode: at most one transfer in flight, and
    pop() does not auto-refill — the consumer calls refill() after forcing
    its dispatched compute to completion, so every transfer runs against an
    idle device. This is for links where DMA starves under concurrent
    execution (the axon tunnel moves ~1.5 GB/s idle but ~45 MB/s while a
    kernel runs — a streamed 14B bf16 pass measured 840 s overlapped vs
    ~40 s serial). On PCIe/DMA hosts keep gated=False: overlap hides the
    transfer entirely.
    """

    def __init__(self, host_items: Sequence[Any], loader: MultiStreamLoader,
                 depth: int = 3, gated: bool = False):
        self.items = list(host_items)
        self.loader = loader
        self.depth = 1 if gated else depth
        self.gated = gated
        self.inflight: List[PendingTree] = []
        self.next_submit = 0
        if not gated:
            self._fill()

    def _fill(self):
        while (self.next_submit < len(self.items)
               and len(self.inflight) < self.depth):
            self.inflight.append(self.loader.put(self.items[self.next_submit]))
            self.next_submit += 1

    def refill(self):
        self._fill()

    def pop(self):
        if not self.inflight:
            self._fill()  # gated consumer that never refilled, or restart
        pending = self.inflight.pop(0)
        tree = pending.get()
        if not self.gated:
            self._fill()
        return pending, tree
