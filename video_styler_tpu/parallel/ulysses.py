"""Ulysses sequence-parallel attention via shard_map + lax.all_to_all.

Explicit-collective counterpart of the reference's all_to_all Ulysses
(denoising_enhancing/wan/distributed/ulysses.py:9-47): sequence-sharded
q/k/v are rescattered so each device holds all tokens for a head subset,
full-sequence attention runs locally (Pallas flash kernel on TPU), and the
result is scattered back to sequence shards.

The GSPMD path (sharding constraints in models/wan_dit.py) usually reaches
the same collectives automatically; this module exists for explicit control
and for benchmarking both strategies.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.attention import attention


def ulysses_attention(q, k, v, mesh: Mesh, axis: str = "sp", scale=None):
    """q/k/v: (B, S, N, D) globally, sharded (B, S/sp, N, D) per device.

    Requires N % sp == 0 and S % sp == 0.
    """
    sp = mesh.shape[axis]
    if sp == 1:
        return attention(q, k, v, scale=scale)

    def local_fn(q, k, v):
        # (B, S/sp, N, D) -> all_to_all -> (B, S, N/sp, D)
        def scatter_heads(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        def gather_seq(x):
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        qh, kh, vh = scatter_heads(q), scatter_heads(k), scatter_heads(v)
        out = attention(qh, kh, vh, scale=scale)
        return gather_seq(out)

    spec = P(None, axis, None, None)
    try:
        smap = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)
    except TypeError:  # older jax uses check_rep
        smap = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_rep=False)
    return smap(q, k, v)
