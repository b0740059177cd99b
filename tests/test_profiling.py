"""Tracing / per-step timing utilities (SURVEY §5 first-class profiling)."""
import json
import os

import jax
import jax.numpy as jnp

from video_styler_tpu.utils.profiling import (
    trace, annotate, StepTimer, make_step_timer, step_timing_enabled)


def test_step_timer_summary():
    t = StepTimer("unit")
    for _ in range(5):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 5
    assert "mean_ms" in s and "p50_ms" in s


def test_make_step_timer_env_gate(monkeypatch):
    monkeypatch.setenv("VIDEO_STYLER_STEP_TIMING", "1")
    assert step_timing_enabled()
    assert make_step_timer("x") is not None
    monkeypatch.setenv("VIDEO_STYLER_STEP_TIMING", "0")
    assert make_step_timer("x") is None


def test_profiler_trace_produces_artifacts(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("unit-matmul"):
            x = jnp.ones((128, 128))
            (x @ x).block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no trace artifacts written"
