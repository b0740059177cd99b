"""First-class tracing / per-step timing (SURVEY §5).

The reference has no structured profiling (tqdm + wall-clock prints only);
here profiling is a first-class utility:

- `trace(dir)` context manager wraps `jax.profiler.trace` — produces a
  TensorBoard-loadable XPlane trace of every XLA computation inside.
- `StepTimer` records per-step wall times with named phases and prints a
  structured summary; `annotate` adds named TraceAnnotations so steps are
  attributable inside the profiler timeline.
- `log_step` is the lightweight always-on path used by the pipelines when
  `VIDEO_STYLER_STEP_TIMING=1`.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/video_styler_trace",
          create_perfetto_link: bool = False):
    """jax.profiler trace over the enclosed block."""
    import jax
    with jax.profiler.trace(log_dir,
                            create_perfetto_link=create_perfetto_link):
        yield log_dir


@contextlib.contextmanager
def annotate(name: str):
    """Named TraceAnnotation — shows up on the profiler timeline."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Per-step timing accumulator.

    >>> timer = StepTimer("denoise")
    >>> with timer.step():
    ...     run_one_step()
    >>> timer.summary()   # {'name': 'denoise', 'steps': N, 'mean_ms': ...}
    """

    def __init__(self, name: str, sync=None):
        self.name = name
        self.times: List[float] = []
        self._sync = sync

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        if self._sync is not None:
            self._sync()
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> Dict:
        if not self.times:
            return {"name": self.name, "steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "name": self.name,
            "steps": n,
            "mean_ms": round(sum(ts) / n * 1e3, 2),
            "p50_ms": round(ts[n // 2] * 1e3, 2),
            "min_ms": round(ts[0] * 1e3, 2),
            "max_ms": round(ts[-1] * 1e3, 2),
            "total_s": round(sum(ts), 3),
        }

    def report(self, file=None):
        print(json.dumps(self.summary()), file=file, flush=True)


def step_timing_enabled() -> bool:
    return os.environ.get("VIDEO_STYLER_STEP_TIMING", "") not in ("", "0")


def make_step_timer(name: str) -> Optional[StepTimer]:
    """Pipelines call this; returns None unless step timing is enabled."""
    if not step_timing_enabled():
        return None
    return StepTimer(name)
