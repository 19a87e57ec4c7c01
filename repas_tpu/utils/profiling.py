"""Profiling hooks (SURVEY.md §5.1).

The reference's ad-hoc FPS counters (capture_aligned_all.py:237-241,
rgbd_viewer.py:335-345 prints every second) become a reusable FpsCounter;
per-stage timing wraps jax.profiler traces when enabled.
"""
from __future__ import annotations

import contextlib
import time

from repas_tpu.utils.logging import get_logger

log = get_logger("perf")


@contextlib.contextmanager
def stage_timer(name: str, sync=None):
    """Wall-time a pipeline stage; pass `sync=jax.block_until_ready`-able
    output getter for accurate device timing."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        import jax

        jax.block_until_ready(sync() if callable(sync) else sync)
    log.info("%s: %.2f ms", name, (time.perf_counter() - t0) * 1e3)


class FpsCounter:
    """Rolling frames/sec, reported every `interval` seconds."""

    def __init__(self, interval: float = 1.0, tag: str = "fps"):
        self.interval = interval
        self.tag = tag
        self._n = 0
        self._t0 = time.perf_counter()
        self.fps = 0.0

    def tick(self, n: int = 1) -> float | None:
        self._n += n
        dt = time.perf_counter() - self._t0
        if dt >= self.interval:
            self.fps = self._n / dt
            self._n = 0
            self._t0 = time.perf_counter()
            log.info("%s: %.1f frames/sec", self.tag, self.fps)
            return self.fps
        return None


@contextlib.contextmanager
def device_trace(logdir: str | None):
    """jax.profiler trace wrapper (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
