"""TileWorker: 2-D tiled inference for image models (SD highres).

Port of /root/reference/diffsynth/models/tiler.py:5-100: unfold into
overlapping tiles, run forward_fn per tile batch, fold back with a clipped
linear border mask. Numpy orchestration; forward_fn is the jitted model.
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def _mask(height: int, width: int, border_width: int) -> np.ndarray:
    x = np.arange(height)[:, None].repeat(width, 1)
    y = np.arange(width)[None, :].repeat(height, 0)
    m = np.stack([x + 1, height - x, y + 1, width - y]).min(axis=0)
    return np.clip(m / border_width, 0, 1).astype(np.float32)


class TileWorker:

    def tiled_forward(self, forward_fn: Callable, model_input,
                      tile_size: int, tile_stride: int,
                      tile_batch_size: int = 1, border_width=None):
        """model_input: (B, C, H, W) numpy/jnp -> blended full output."""
        import jax.numpy as jnp
        x = np.asarray(model_input, np.float32)
        b, c, H, W = x.shape
        tile_size = min(tile_size, H, W)
        tiles = []
        positions = []
        for h0 in range(0, max(H - tile_size, 0) + 1, tile_stride):
            for w0 in range(0, max(W - tile_size, 0) + 1, tile_stride):
                tiles.append(x[:, :, h0:h0 + tile_size, w0:w0 + tile_size])
                positions.append((h0, w0))
        # ensure right/bottom coverage
        if (H - tile_size) % tile_stride != 0:
            for w0 in range(0, max(W - tile_size, 0) + 1, tile_stride):
                tiles.append(x[:, :, H - tile_size:, w0:w0 + tile_size])
                positions.append((H - tile_size, w0))
        if (W - tile_size) % tile_stride != 0:
            for h0 in range(0, max(H - tile_size, 0) + 1, tile_stride):
                tiles.append(x[:, :, h0:h0 + tile_size, W - tile_size:])
                positions.append((h0, W - tile_size))

        outs = []
        for i in range(0, len(tiles), tile_batch_size):
            batch = np.concatenate(tiles[i:i + tile_batch_size], axis=0)
            y = np.asarray(forward_fn(jnp.asarray(batch)), np.float32)
            outs.extend(np.split(y, y.shape[0] // b, axis=0))

        scale = outs[0].shape[2] / tile_size
        out_c = outs[0].shape[1]
        out_H, out_W = int(H * scale), int(W * scale)
        out_tile = outs[0].shape[2]
        if border_width is None:
            border_width = int((tile_size - tile_stride) * scale)
        mask = _mask(out_tile, out_tile, max(border_width, 1))[None, None]
        value = np.zeros((b, out_c, out_H, out_W), np.float32)
        weight = np.zeros((1, 1, out_H, out_W), np.float32)
        for (h0, w0), y in zip(positions, outs):
            oh, ow = int(h0 * scale), int(w0 * scale)
            value[:, :, oh:oh + out_tile, ow:ow + out_tile] += y * mask
            weight[:, :, oh:oh + out_tile, ow:ow + out_tile] += mask
        return jnp.asarray(value / np.maximum(weight, 1e-8))
