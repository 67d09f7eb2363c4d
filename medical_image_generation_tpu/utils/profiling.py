"""Tracing and profiling hooks.

The reference's only observability is wall-clock prints per epoch
(train_autoencoder.py:338,361-366). SURVEY.md §5 calls for proper TPU
tracing: this module wraps ``jax.profiler`` so any trainer run can emit an
XPlane trace for Perfetto/TensorBoard, plus a lightweight step timer with
p50/p95 and steps/sec summaries.

Enable traces via config ``profile_dir`` or the ``MEDIMGEN_PROFILE_DIR``
env var.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block when enabled."""
    trace_dir = trace_dir or os.environ.get("MEDIMGEN_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
    print(f"[profile] trace written to {trace_dir}")


class StepTimer:
    """Per-step wall-clock stats: call tick() once per step."""

    def __init__(self, name: str = "step"):
        self.name = name
        self._times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def summary(self, skip_first: int = 1) -> dict:
        times = np.asarray(self._times[skip_first:] or self._times)
        if times.size == 0:
            return {}
        return {
            "steps": int(times.size),
            "mean_s": float(times.mean()),
            "p50_s": float(np.percentile(times, 50)),
            "p95_s": float(np.percentile(times, 95)),
            "steps_per_sec": float(1.0 / times.mean()),
        }

    def report(self, skip_first: int = 1) -> str:
        s = self.summary(skip_first)
        if not s:
            return f"[{self.name}] no steps recorded"
        return (
            f"[{self.name}] {s['steps']} steps | {s['steps_per_sec']:.2f} steps/s | "
            f"p50 {s['p50_s'] * 1e3:.1f} ms | p95 {s['p95_s'] * 1e3:.1f} ms"
        )


def maybe_progress(iterable, enabled: bool, total: Optional[int] = None,
                   desc: str = ""):
    """tqdm progress bar gated by the -p flag (reference
    train_autoencoder.py:336,340); falls back to the bare iterable."""
    if not enabled:
        return iterable
    try:
        from tqdm import tqdm

        return tqdm(iterable, total=total, ncols=100, desc=desc)
    except Exception:  # pragma: no cover
        return iterable
