"""Offline latent caching: preprocess once, train from cached tensors.

TPU-native analog of the reference data-process task
(/root/reference/diffsynth/trainers/utils.py:569-590
launch_data_process_task + the `load_from_cache` branch of
launch_training_task at utils.py:553-558): a pass over the dataset runs the
expensive encoders (VAE, text towers) once and writes each sample's model
inputs to disk; training then streams the cached tensors and keeps the TPU
on the DiT step only.

Differences from the reference, by design:
  * samples are .npz (numpy archives), not torch pickles — loadable with
    zero framework imports in the input pipeline;
  * multi-host sharding is explicit (process_index/num_processes stride)
    instead of relying on an accelerate DataLoader split.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np


def save_cached_sample(folder: str, idx: int, sample: Dict) -> str:
    """Write one preprocessed sample (flat dict of arrays / scalars / strings)
    as `{folder}/{idx}.npz`. None values are dropped."""
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f"{idx}.npz")
    arrays, meta = {}, {}
    for k, v in sample.items():
        if v is None:
            continue
        if isinstance(v, (str, int, float, bool)):
            meta[k] = v
        else:
            arrays[k] = np.asarray(v)
    if meta:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), np.uint8).copy()
    np.savez(path, **arrays)
    return path


def load_cached_sample(path: str) -> Dict:
    with np.load(path) as z:
        sample = {k: z[k] for k in z.files if k != "__meta__"}
        if "__meta__" in z.files:
            sample.update(json.loads(z["__meta__"].tobytes().decode()))
    return sample


def launch_data_process_task(
    dataset,
    preprocess_fn: Callable[[Dict], Dict],
    output_path: str,
    process_index: int = 0,
    num_processes: int = 1,
    progress_bar=None,
) -> List[str]:
    """One preprocessing pass: every `num_processes`-th sample (starting at
    `process_index`) goes through `preprocess_fn` and is saved under
    `{output_path}/{process_index}/{data_id}.npz` — the same per-process
    folder layout as the reference (utils.py:586-590)."""
    folder = os.path.join(output_path, str(process_index))
    indices = range(process_index, len(dataset), num_processes)
    if progress_bar is not None:
        indices = progress_bar(indices)
    written = []
    for data_id in indices:
        sample = preprocess_fn(dataset[data_id])
        if sample is None:
            continue
        written.append(save_cached_sample(folder, data_id, sample))
    return written


class CachedLatentDataset:
    """`load_from_cache` analog: iterates every {shard}/{id}.npz under the
    cache root, returning dicts of numpy arrays ready for the train step."""

    load_from_cache = True

    def __init__(self, cache_path: str, repeat: int = 1):
        self.paths = sorted(
            os.path.join(root, f)
            for root, _, files in os.walk(cache_path)
            for f in files if f.endswith(".npz"))
        if not self.paths:
            raise FileNotFoundError(f"no cached .npz samples under {cache_path}")
        self.repeat = repeat

    def __len__(self):
        return len(self.paths) * self.repeat

    def __getitem__(self, idx) -> Dict:
        return load_cached_sample(self.paths[idx % len(self.paths)])
