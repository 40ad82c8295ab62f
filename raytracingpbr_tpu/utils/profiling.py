"""Observability: timing harness + structured metrics logging.

New components (SURVEY.md §5 "Tracing/profiling", "Metrics/logging"): the
reference has only print statements; here renders emit per-frame JSONL
metrics (samples/s, rays/s, mean luma, noise histogram) and a
block-until-ready timing harness measures steady-state kernel throughput.
``jax.profiler`` traces can be wrapped around any section for XProf.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Optional

import jax
import numpy as np


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kw) -> float:
    """Steady-state seconds/call (jit-compiles on the warmup calls)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def xprof_trace(logdir: Optional[str]):
    """Optional jax.profiler trace around a section (viewable in XProf)."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


class MetricsLogger:
    """Append-only JSONL metrics stream (one object per frame/step)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._f = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, **fields) -> None:
        if self._f is None:
            return
        fields.setdefault("t", round(time.time() - self._t0, 3))
        self._f.write(json.dumps(fields) + "\n")
        self._f.flush()

    def frame_stats(self, pixels: np.ndarray, accum: np.ndarray,
                    dt: float, **extra) -> dict:
        """Standard per-frame stats bundle (logged and returned)."""
        count = accum[:, 3]
        stats = dict(
            dt=round(dt, 5),
            samples_per_s=float(count.sum()) / max(dt, 1e-9),
            mean_luma=float(
                (pixels * np.array([0.299, 0.587, 0.114])).sum(-1).mean()),
            mean_spp=float(count.mean()),
            **extra,
        )
        self.log(**stats)
        return stats

    def close(self):
        if self._f:
            self._f.close()
