"""Tracing / profiling utilities.

The reference exposes ad-hoc ``profile=True`` stage timers (reference:
src/manuscript/_pipeline.py:63-165, infer.py:308-337). Here that API is kept
(StageTimer) and extended with real device tracing: ``trace()`` wraps
``jax.profiler`` so a TensorBoard-viewable trace of the XLA execution can be
captured, and ``annotate()`` adds named regions. Timers fence with
``block_until_ready`` so async dispatch doesn't hide device time.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StageTimer:
    """Accumulating wall-clock stage timer with optional device fencing."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: List[tuple] = []
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.time()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            if self.enabled:
                self.stages.append((name, time.time() - t0))

    def report(self) -> str:
        total = sum(dt for _, dt in self.stages)
        lines = [f"  {name}: {dt:.3f}s" for name, dt in self.stages]
        lines.append(f"  total: {total:.3f}s")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return {name: dt for name, dt in self.stages}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
