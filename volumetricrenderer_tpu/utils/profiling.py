"""Tracing / profiling.

The reference's only observability is named CommandBuffers visible in Unity's
frame debugger (SURVEY §5: "Volumetric Render Command" cs:51 etc.) plus shader
debug symbols. TPU equivalents:

- the pipeline passes run inside `jax.named_scope`s (renderer.py), so XLA/HLO
  and profiler traces carry pass names like the CommandBuffer labels did;
- `trace()` wraps `jax.profiler.trace` for TensorBoard-viewable device traces;
- `FrameTimer` measures steady-state ms/frame (the BASELINE metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, List

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Device-level profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Steady-state frame timing: call per frame; durations include device sync."""

    def __init__(self):
        self.times: List[float] = []

    def measure(self, fn: Callable, *args, n_warmup: int = 3, n_measure: int = 20):
        out = None
        for _ in range(n_warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        self.times.clear()
        for _ in range(n_measure):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            self.times.append(time.perf_counter() - t0)
        return out

    @property
    def median_ms(self) -> float:
        s = sorted(self.times)
        return s[len(s) // 2] * 1e3

    @property
    def best_ms(self) -> float:
        return min(self.times) * 1e3
