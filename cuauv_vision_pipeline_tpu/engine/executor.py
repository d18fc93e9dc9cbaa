"""Device executors: jitted chains + software-pipelined streaming.

The reference overlaps SDK retrieval with numpy postprocessing using a
double-buffered thread pool (reference capture_sources/zed.py:14-20,
129-253). On TPU the same latency-hiding falls out of XLA's async dispatch:
``jax.device_put`` starts the H2D copy and jitted calls enqueue without
blocking, so a StreamExecutor that delays materializing frame N's result
until frame N+1 has been submitted gets transfer/compute overlap for free —
no threads, no GIL.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np


class DevicePipeline:
    """A jit-compiled frame chain with explicit warmup.

    ``fn`` is any jittable callable over arrays. Call sites pass numpy or
    device arrays; results are device arrays (async futures under the hood).
    """

    def __init__(self, fn: Callable, static_argnames: Tuple[str, ...] = ()):
        self._fn = jax.jit(fn, static_argnames=static_argnames)
        self._compiled = False

    def warmup(self, *args: Any, **kwargs: Any) -> None:
        """Trigger compilation (first TPU compile can take tens of seconds)."""
        out = self._fn(*args, **kwargs)
        jax.block_until_ready(out)
        self._compiled = True

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self._fn(*args, **kwargs)

    def run_sync(self, *args: Any, **kwargs: Any) -> Any:
        """Run and materialize results as numpy (blocking)."""
        out = self._fn(*args, **kwargs)
        return jax.tree.map(np.asarray, out)


class StreamExecutor:
    """One-deep software pipeline over a DevicePipeline.

    ``submit(frame)`` enqueues H2D + compute for this frame and returns the
    *previous* frame's completed result (or None on the first call) — so the
    TPU computes frame N while the host reads frame N+1 off the bus.
    ``flush()`` drains the last pending result.
    """

    def __init__(self, pipeline: DevicePipeline):
        self.pipeline = pipeline
        self._pending: Optional[Tuple[Any, Any]] = None  # (result, meta)

    def submit(self, args: Tuple[Any, ...], meta: Any = None) -> Optional[Tuple[Any, Any]]:
        device_args = tuple(
            jax.device_put(a) if isinstance(a, np.ndarray) else a for a in args
        )
        fut = self.pipeline(*device_args)
        prev = self._pending
        self._pending = (fut, meta)
        if prev is None:
            return None
        result, prev_meta = prev
        return jax.tree.map(np.asarray, result), prev_meta

    def flush(self) -> Optional[Tuple[Any, Any]]:
        if self._pending is None:
            return None
        result, meta = self._pending
        self._pending = None
        return jax.tree.map(np.asarray, result), meta


class EmaTimer:
    """EMA stage timing (the reference's StageBenchmark pattern,
    reference capture_sources/zed.py:53-80)."""

    def __init__(self, alpha: float = 0.1, report_every_s: float = 3.0):
        self.alpha = alpha
        self.report_every_s = report_every_s
        self.stages: dict = {}
        self._last_report = time.monotonic()

    def record(self, stage: str, seconds: float) -> None:
        prev = self.stages.get(stage)
        self.stages[stage] = (
            seconds if prev is None else prev * (1 - self.alpha) + seconds * self.alpha
        )

    def maybe_report(self, log_fn: Callable[[str], None]) -> None:
        now = time.monotonic()
        if now - self._last_report >= self.report_every_s:
            self._last_report = now
            parts = ", ".join(
                f"{name}={sec * 1000:.2f}ms" for name, sec in self.stages.items()
            )
            log_fn(f"stage timings (EMA a={self.alpha}): {parts}")
