"""Ring attention via shard_map + lax.ppermute.

The reference's xdit USP context parallelism factors into ulysses x ring
(denoising_enhancing/wan/distributed/xdit_context_parallel.py); it ships
with ring degree 1 in practice. This is the real ring: q stays put while
k/v blocks rotate around the ICI ring, accumulating attention with an
online (flash-style) running softmax — sequence length scales with the
ring size at O(S/n) memory per chip, and the permute overlaps with the
block matmuls.

Composes with Ulysses: mesh ("sp" ulysses) x ("ring") covers N*ring-way
sequence parallelism.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _ring_body(q, k0, v0, axis: str, n_dev: int, scale: float):
    """Local online-softmax accumulation over the rotating k/v ring.

    q (B, Sq, N, D) local queries; k0/v0 local key/value blocks.
    """
    b, sq, n, d = q.shape
    qf = q.astype(jnp.float32) * scale
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        o, m, l, k_blk, v_blk = carry
        s = jnp.einsum("bqnd,bknd->bnqk", qf, k_blk.astype(jnp.float32))
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bnqk,bknd->bnqd", p, v_blk.astype(jnp.float32))
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return (o, m_new, l, k_blk, v_blk), None

    o = jnp.zeros((b, n, sq, d), jnp.float32)
    m = jnp.full((b, n, sq), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, n, sq), jnp.float32)
    (o, m, l, _, _), _ = jax.lax.scan(step, (o, m, l, k0, v0), None,
                                      length=n_dev)
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "sp",
                   scale: Optional[float] = None):
    """q/k/v: (B, S, N, D) globally, sequence-sharded (B, S/n, N, D).

    Exact (bitwise-tolerance) match of full attention for any sequence
    split; no head-count divisibility requirement (unlike Ulysses)."""
    n_dev = mesh.shape[axis]
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if n_dev == 1:
        from ..ops.attention import attention
        return attention(q, k, v, scale=scale)

    fn = partial(_ring_body, axis=axis, n_dev=n_dev, scale=scale)
    spec = P(None, axis, None, None)
    try:
        smap = shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)
    except TypeError:  # older jax uses check_rep
        smap = shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_rep=False)
    return smap(q, k, v)
