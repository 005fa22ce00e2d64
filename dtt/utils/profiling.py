"""Profiling / tracing helpers.

The reference has no profiling subsystem (occasional time.time() prints —
SURVEY.md §5); here: XProf/TensorBoard device traces via jax.profiler, trace
annotations, and a block-until-ready step timer for honest device timings.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA/TPU trace viewable in TensorBoard's profile plugin /
    xprof: everything inside the block is recorded."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # with annotate("step"): ...


class StepTimer:
    """Wall-clock timer that blocks on device results (honest step times)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(time.perf_counter() - t0)

    def time_fn(self, fn, *args, iters: int = 10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    @property
    def mean(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        ts = sorted(self._times)
        return {
            "steps": len(ts),
            "mean_s": self.mean,
            "p50_s": ts[len(ts) // 2],
            "p95_s": ts[int(len(ts) * 0.95)],
        }
