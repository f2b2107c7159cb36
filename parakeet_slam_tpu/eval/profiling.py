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
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Profile the enclosed block; view with XProf/TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_sync(out):
    """Force REAL device completion by reading back one element of the last
    output. On the tunneled TPU backend in this environment,
    `jax.block_until_ready` returns without waiting (verified: 10 chained
    8192^3 matmuls "finished" in 53us), so every timing harness must sync
    through a host readback; the device queue is in-order, so one element
    of the final result fences everything before it."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    flat = jax.numpy.ravel(leaf) if hasattr(leaf, "ravel") else leaf
    np.asarray(jax.device_get(flat[:1]))
    return out


def timed(fn, *args, reps: int = 10, warmup: int = 2):
    """(mean_seconds, last_output) with readback-fenced synchronization.

    The constant readback latency is removed by differencing a 1-rep
    baseline from the reps-long chain (slope method)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    device_sync(out)

    def chain(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        device_sync(o)
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(2))
    while True:
        tn = min(chain(reps + 1) for _ in range(2))
        # The slope must clear the tunnel/readback jitter or the estimate
        # is garbage (observed: a ~60us kernel timing as 0.0ms at reps=10
        # because tn-t1 drowned in ms-scale RTT noise). Grow the chain
        # until the measured delta is unambiguous.
        if tn - t1 > max(0.25 * t1, 2e-3) or reps >= 2048:
            break
        reps *= 4
    return max((tn - t1) / reps, 1e-9), out


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
