"""Tracing / profiling (SURVEY.md §5): jax.profiler traces viewable in
TensorBoard's profile plugin, plus precise step timing via
``block_until_ready`` fences."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an XLA/TPU profile: ``with trace('/tmp/tb'): run_steps()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(result: dict, key: str = "seconds") -> Iterator[None]:
    """Wall-clock a device computation. The caller must block on the step's
    outputs inside the ``with`` body (e.g. ``jax.block_until_ready(m)``) so
    async dispatch doesn't hide device time."""
    t0 = time.perf_counter()
    yield
    result[key] = time.perf_counter() - t0
