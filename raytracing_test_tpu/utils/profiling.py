"""Tracing / profiling utilities — the TPU equivalent of the reference's
wall-clock instrumentation (SURVEY.md §5.1).

The reference times world gen once (main.cpp:187-193) and prints a rolling
40-frame average of frame time / FPS to stdout every frame (main.cpp:204-225).
Here:

  - ``FrameStats``: the same 40-sample rolling frame-time/FPS counter, plus
    a rays/s rate (the framework's native throughput unit).
  - ``phase``: a wall-clock context manager for one-off phases (world gen,
    compile, upload) that MATERIALIZES device results before stopping the
    clock — on the tunneled axon backend ``block_until_ready`` returns before
    remote completion (CLAUDE.md), so callers pass the arrays to sync on.
  - ``trace``: ``jax.profiler`` trace scope, gated so it degrades to a no-op
    where the backend has no profiler support.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Optional

import numpy as np

from .log import debug


def sync(*arrays) -> None:
    """Materialize device arrays (the reliable completion barrier here)."""
    for a in arrays:
        np.asarray(a)


@contextlib.contextmanager
def phase(name: str, *, level: int = 1):
    """Time a host-visible phase; prints via the leveled debug logger."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        debug(level, f"{name}: {(time.perf_counter() - t0) * 1e3:.1f} ms")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace scope (open the result in TensorBoard/XProf).
    No-op when ``log_dir`` is falsy or the backend lacks profiler support."""
    if not log_dir:
        yield
        return
    import jax

    # Guard only profiler ENTRY: if the trace context can't even start
    # (tunneled backends may not expose the profiler), degrade to untraced.
    # The yield itself must stay outside the except path so user exceptions
    # in the with-body propagate unmasked.
    try:
        ctx = jax.profiler.trace(log_dir)
        ctx.__enter__()
    except Exception as e:
        debug(1, f"profiler trace unavailable ({e}); continuing untraced")
        yield
        return
    try:
        yield
    except BaseException:
        ctx.__exit__(*__import__("sys").exc_info())
        raise
    else:
        ctx.__exit__(None, None, None)


class FrameStats:
    """Rolling frame statistics (the reference's 40-frame average,
    main.cpp:221-225), extended with a rays/s rate."""

    def __init__(self, window: int = 40):
        self.times = collections.deque(maxlen=window)
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, rays: int = 0) -> float:
        """Record one frame; returns the frame time in seconds."""
        assert self._last is not None, "call start() first"
        dt = time.perf_counter() - self._last
        self._last = None
        self.times.append((dt, rays))
        return dt

    @property
    def avg_ms(self) -> float:
        if not self.times:
            return 0.0
        return 1e3 * sum(t for t, _ in self.times) / len(self.times)

    @property
    def fps(self) -> float:
        return 1e3 / self.avg_ms if self.avg_ms else 0.0

    @property
    def rays_per_s(self) -> float:
        tot_t = sum(t for t, _ in self.times)
        tot_r = sum(r for _, r in self.times)
        return tot_r / tot_t if tot_t else 0.0

    def status(self) -> str:
        return (
            f"avg frame {self.avg_ms:.1f} ms  {self.fps:.1f} fps"
            + (f"  {self.rays_per_s:.3e} rays/s" if self.rays_per_s else "")
        )
