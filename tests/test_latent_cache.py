"""Offline latent cache: save/load round-trip, process sharding, dataset
iteration (reference trainers/utils.py:569-590 analog)."""
import numpy as np
import pytest

from video_styler_tpu.trainers.latent_cache import (
    CachedLatentDataset, launch_data_process_task, load_cached_sample,
    save_cached_sample)


def _rows(n):
    rng = np.random.default_rng(0)
    return [{"latents": rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32),
             "prompt": f"p{i}"} for i in range(n)]


def test_sample_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    sample = {"latents": rng.standard_normal((2, 3)).astype(np.float32),
              "context": rng.standard_normal((1, 5, 8)).astype(np.float32),
              "prompt": "hello", "steps": 4, "skip": None}
    path = save_cached_sample(str(tmp_path), 0, sample)
    back = load_cached_sample(path)
    np.testing.assert_array_equal(back["latents"], sample["latents"])
    np.testing.assert_array_equal(back["context"], sample["context"])
    assert back["prompt"] == "hello" and back["steps"] == 4
    assert "skip" not in back


def test_data_process_task_and_cached_dataset(tmp_path):
    rows = _rows(5)

    def preprocess(row):
        return {"latents": row["latents"] * 2, "prompt": row["prompt"]}

    written = launch_data_process_task(rows, preprocess, str(tmp_path))
    assert len(written) == 5

    ds = CachedLatentDataset(str(tmp_path))
    assert len(ds) == 5
    for i in range(5):
        np.testing.assert_array_equal(ds[i]["latents"], rows[i]["latents"] * 2)
        assert ds[i]["prompt"] == rows[i]["prompt"]
    assert ds.load_from_cache


def test_data_process_sharding(tmp_path):
    rows = _rows(7)
    pre = lambda row: {"latents": row["latents"]}
    for pi in range(2):
        launch_data_process_task(rows, pre, str(tmp_path), process_index=pi,
                                 num_processes=2)
    ds = CachedLatentDataset(str(tmp_path), repeat=2)
    assert len(ds) == 14
    # every source sample appears exactly once per repeat
    seen = sorted(int(p.split("/")[-1][:-4]) for p in ds.paths)
    assert seen == list(range(7))


def test_skipped_samples_are_dropped(tmp_path):
    rows = _rows(3)
    pre = lambda row: None if row["prompt"] == "p1" else {"x": row["latents"]}
    written = launch_data_process_task(rows, pre, str(tmp_path))
    assert len(written) == 2
    assert len(CachedLatentDataset(str(tmp_path))) == 2


def test_empty_cache_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        CachedLatentDataset(str(tmp_path))
