"""Sharding context: logical-axis constraints inside model code.

Instead of the reference's monkey-patched USP forwards
(diffsynth/distributed/xdit_context_parallel.py:42-131), parallelism is
declared: model code calls `constrain(x, "dp", "sp", None)` at key points and
GSPMD inserts the collectives. With no active context these are no-ops, so
single-chip code paths are untouched.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


class ShardingContext:
    def __init__(self, mesh: Mesh, ulysses: bool = True):
        self.mesh = mesh
        self.ulysses = ulysses

    def named(self, *axes) -> NamedSharding:
        return NamedSharding(self.mesh, P(*axes))


def current_sharding() -> Optional[ShardingContext]:
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def use_sharding(ctx: Optional[ShardingContext]):
    prev = current_sharding()
    _state.ctx = ctx
    try:
        yield ctx
    finally:
        _state.ctx = prev


def axis_size(ax) -> int:
    """Size of a mesh axis (or product for a tuple) under the active
    context; 1 when no context is active or the axis is absent."""
    ctx = current_sharding()
    if ctx is None or ax is None:
        return 1
    if isinstance(ax, tuple):
        out = 1
        for a in ax:
            out *= axis_size(a)
        return out
    return int(ctx.mesh.shape.get(ax, 1))


def seq_pad_amount(seq_len: int, *axes) -> int:
    """Zero-padding needed on a sequence of `seq_len` so it divides the
    product of the given mesh axes — the pad→shard→unpad path the reference
    implements with chunk+pad before rank-slicing
    (/root/reference/diffsynth/distributed/xdit_context_parallel.py:76-80).

    Unlike the reference (whose zero-pad tokens participate as attention
    keys), callers here thread the true length into the flash kernels as a
    static `kv_valid`, so padded tokens are masked exactly and the sharded
    output matches the single-device one bit-for-bit (modulo reduction
    order)."""
    total = 1
    for ax in axes:
        total *= axis_size(ax)
    return (-seq_len) % total


_warned_drops = set()
_drop_count = 0


def drop_count() -> int:
    """Number of ragged constrain-drops since the last reset — a drop means
    some tensor silently serializes on a mesh axis. __graft_entry__'s dryrun
    asserts this stays zero across the full sweep."""
    return _drop_count


def reset_drop_count():
    global _drop_count
    _drop_count = 0
    _warned_drops.clear()


def constrain(x, *axes):
    """with_sharding_constraint under the active context; identity otherwise.

    Axis entries are mesh-axis names (or None). A dim of extent 1 under an
    axis of size >1 has nothing to distribute — batch-1 inference under a
    dp>1 training mesh — so it maps to None by design (the reference's USP
    wrappers likewise only ever split the sequence dim for inference,
    xdit_context_parallel.py:15-40). Any OTHER non-divisible dim is a
    genuine ragged drop: the tensor serializes on that axis, which is a
    silent perf cliff, so it is counted and warned once per shape.
    """
    ctx = current_sharding()
    if ctx is None:
        return x
    fixed = []
    for dim, ax in enumerate(axes):
        if ax is None:
            fixed.append(None)
            continue
        size = ctx.mesh.shape[ax] if not isinstance(ax, tuple) else 1
        if isinstance(ax, tuple):
            fixed.append(ax)
        elif x.shape[dim] % size == 0:
            fixed.append(ax)
        elif x.shape[dim] == 1:
            fixed.append(None)  # nothing to distribute; replicate by design
        else:
            global _drop_count
            _drop_count += 1
            key = (ax, size, x.shape[dim])
            if key not in _warned_drops:
                _warned_drops.add(key)
                import warnings
                warnings.warn(
                    f"constrain: dim {dim} of shape {tuple(x.shape)} is not "
                    f"divisible by mesh axis '{ax}' (size {size}); dropping "
                    f"the sharding for this tensor — that axis serializes. "
                    f"Pad the sequence or pick a divisible mesh.",
                    stacklevel=2)
            fixed.append(None)
    return jax.lax.with_sharding_constraint(x, ctx.named(*fixed))
