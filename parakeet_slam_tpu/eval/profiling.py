"""Tracing / profiling integration (SURVEY.md §6 "tracing/profiling").

Wraps `jax.profiler` so any run can emit a Perfetto/XProf trace:

    from parakeet_slam_tpu.eval.profiling import trace
    with trace("/tmp/slam_trace"):
        run_sequence(...)

plus a `timed` helper used by the benchmark harnesses (block_until_ready
discipline so device async execution doesn't fake the numbers).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Profile the enclosed block; view with XProf/TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 10, warmup: int = 2):
    """(mean_seconds, last_output) with proper device synchronization."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
