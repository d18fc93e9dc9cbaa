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
from collections import deque
from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np

from ..core.jaxconfig import ensure_compile_cache

ensure_compile_cache()


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
    """Depth-N software pipeline over a DevicePipeline.

    ``submit(frame)`` enqueues H2D + compute for this frame; once the queue
    holds ``depth`` in-flight frames it returns the *oldest* completed
    result — so the TPU computes frame N while the host reads frame N+1 off
    the bus (depth 1), or keeps several transfers in flight to hide a
    high-latency link (depth > 1). ``flush()``/``flush_one()`` drain
    pending results; ``pending`` reports queue occupancy.
    """

    def __init__(self, pipeline: DevicePipeline, depth: int = 1):
        if depth < 1:
            raise ValueError("pipeline depth must be >= 1")
        self.pipeline = pipeline
        self.depth = depth
        self._queue: "deque[Tuple[Any, Any]]" = deque()  # (result_fut, meta)

    @property
    def pending(self) -> int:
        return len(self._queue)

    def submit(
        self, args: Tuple[Any, ...], meta: Any = None, **kwargs: Any
    ) -> Optional[Tuple[Any, Any]]:
        device_args = tuple(
            jax.device_put(a) if isinstance(a, np.ndarray) else a for a in args
        )
        fut = self.pipeline(*device_args, **kwargs)
        self._queue.append((fut, meta))
        if len(self._queue) <= self.depth:
            return None
        return self.flush_one()

    def flush_one(self) -> Optional[Tuple[Any, Any]]:
        """Materialize the oldest in-flight result (blocking), or None."""
        if not self._queue:
            return None
        result, meta = self._queue.popleft()
        return jax.tree.map(np.asarray, result), meta

    def flush(self) -> list:
        """Materialize every in-flight result, oldest first."""
        out = []
        while self._queue:
            out.append(self.flush_one())
        return out


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
