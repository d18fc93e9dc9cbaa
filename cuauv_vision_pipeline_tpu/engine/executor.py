"""Device executors: jitted chains + software-pipelined streaming.

The reference overlaps SDK retrieval with numpy postprocessing using a
double-buffered thread pool (reference capture_sources/zed.py:14-20,
129-253). On TPU the same latency-hiding falls out of XLA's async dispatch:
``jax.device_put`` starts the H2D copy and jitted calls enqueue without
blocking, so a StreamExecutor that delays materializing frame N's result
until frame N+1 has been submitted gets transfer/compute overlap for free —
no threads, no GIL.

Two additional mechanisms matter on high-latency links (and cost nothing on
PCIe):

* **packed results** (``pack_result``/``unpack_result``): every leaf of a
  result pytree fetched with ``np.asarray`` is a separate blocking
  device-to-host round trip. Packing bit-casts all leaves into ONE uint32
  vector on device, so a whole result costs one fetch (measured on the
  tunnel-attached harness: 4-leaf fetch 500-900 ms -> 1 fetch ~150 ms).
* **async fetch** (``StreamExecutor(async_fetch=True)``): materialization
  happens on a worker thread, overlapping the next frame's H2D/dispatch
  with the previous result's readback; throughput becomes
  max(transfer, fetch) instead of their sum.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from collections import deque
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.jaxconfig import ensure_compile_cache

ensure_compile_cache()

# CUAUV_ZERO_COPY_H2D=1: hand the bus staging buffer to the device runtime
# through dlpack instead of the numpy ingest path, skipping one host-side
# bounce copy per frame (SURVEY §7 "copy once into the pinned H2D staging
# buffer"). Safe with the staging-depth contract (views stay valid for
# depth+1 reads, core/bindings/frame_bus.py). Opt-in: invisible behind a
# tunnel RTT, measurable on PCIe hosts (bench.py h2d_zero_copy_ms).
_ZERO_COPY_H2D = os.environ.get("CUAUV_ZERO_COPY_H2D", "") == "1"


def _host_to_device(a: Any) -> Any:
    if not isinstance(a, np.ndarray):
        return a
    if _ZERO_COPY_H2D:
        try:
            # no explicit device: placement must follow jax_default_device so
            # the --device N per-chip module pinning (core/base.py) holds
            return jax.device_put(jnp.from_dlpack(a))
        except Exception:
            pass  # non-contiguous / unsupported dtype: numpy path below
    return jax.device_put(a)


# ---------------------------------------------------------------------------
# result packing: one device->host fetch per result pytree
# ---------------------------------------------------------------------------


def pack_result(result: Any, spec_cell: dict) -> jnp.ndarray:
    """Flatten a result pytree into ONE uint32 vector (traced; exact).

    4-byte leaves are bit-cast; sub-word leaves pack at NATIVE width (4 u8
    / 2 u16 per word, zero-padded to a word boundary) so multi-megabyte u8
    images ride along without the 4x widening blow-up; bools pack as u8;
    8-byte leaves bit-cast to uint32 pairs. The static unpack recipe lands
    in ``spec_cell['spec']`` at trace time.
    """
    leaves, treedef = jax.tree_util.tree_flatten(result)
    metas: List[Tuple[Tuple[int, ...], Any, int]] = []
    parts: List[jnp.ndarray] = []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        dt = np.dtype(arr.dtype)
        flat = arr.ravel()
        n = flat.shape[0]
        if dt == np.bool_:
            flat = flat.astype(jnp.uint8)
        if flat.dtype.itemsize < 4:
            # group k = 4/itemsize elements per u32 word, zero-padded
            u = {1: jnp.uint8, 2: jnp.uint16}[flat.dtype.itemsize]
            k = 4 // flat.dtype.itemsize
            flat = jax.lax.bitcast_convert_type(flat, u)
            pad = (-n) % k
            if pad:
                flat = jnp.concatenate([flat, jnp.zeros((pad,), u)])
            words = jax.lax.bitcast_convert_type(
                flat.reshape(-1, k), jnp.uint32
            )
        elif flat.dtype.itemsize == 4:
            words = jax.lax.bitcast_convert_type(flat, jnp.uint32)
        else:  # 8-byte: two uint32 words per element (little-endian pairs)
            words = jax.lax.bitcast_convert_type(flat, jnp.uint32).ravel()
        metas.append((arr.shape, dt, int(words.shape[0])))
        parts.append(words)
    spec_cell["spec"] = (treedef, metas)
    if not parts:
        return jnp.zeros((0,), jnp.uint32)
    return jnp.concatenate(parts)


def build_packed_fn(
    dev_bound: Callable, dev_batch: int, dev_batch_mode: str
) -> Tuple[Callable, dict]:
    """The exact jit target ModuleBase dispatches for a @device_fn.

    Wraps the module's chain so ``(result, posts)`` pack into ONE
    fetchable u32 vector; batched chains combine fresh lanes via vmap /
    ``lax.map``. Returns ``(packed_fn, spec_cells)`` where ``spec_cells``
    maps ``(want_posts, nlanes)`` -> unpack spec, populated at trace time.

    Shared by ``ModuleBase.run`` and :mod:`engine.prewarm` so ahead-of-
    time compiles in one process produce byte-identical HLO — and
    therefore persistent-cache hits — for the module processes spawned
    later (the multi-minute cold compile of a chain through a
    remote-attached backend then happens once per machine, before any
    frame flows)."""
    spec_cells: dict = {}

    if dev_batch > 1:
        # per-frame user chain combined over the leading lane axis (tuners
        # broadcast); only FRESH lanes are dispatched, so the lane count
        # varies 1..batch — one cached trace each. batch_mode="vmap"
        # vectorizes lanes; "map" runs them sequentially inside the one
        # dispatch (single-frame VMEM profile — see the device_fn
        # docstring).
        def packed_fn(batched, *, tuners, want_posts, _fn=dev_bound):
            def one(frame):
                return _fn(frame, tuners=tuners, want_posts=want_posts)

            if dev_batch_mode == "map" and batched.shape[0] > 1:
                result, posts = jax.lax.map(one, batched)
            else:
                result, posts = jax.vmap(one)(batched)
            cell = spec_cells.setdefault(
                (want_posts, int(batched.shape[0])), {}
            )
            return pack_result((result, posts), cell)

    else:

        def packed_fn(*frames, tuners, want_posts, _fn=dev_bound):
            result, posts = _fn(*frames, tuners=tuners, want_posts=want_posts)
            cell = spec_cells.setdefault((want_posts, 0), {})
            return pack_result((result, posts), cell)

    return packed_fn, spec_cells


def unpack_result(packed: np.ndarray, spec) -> Any:
    """Invert :func:`pack_result` on the host (zero-copy views where
    possible)."""
    treedef, metas = spec
    packed = np.asarray(packed, dtype=np.uint32)
    out = []
    off = 0
    for shape, dt, words in metas:
        n = int(np.prod(shape)) if shape else 1
        chunk = packed[off : off + words]
        off += words
        if dt == np.bool_:
            vals = chunk.view(np.uint8)[:n].astype(np.bool_)
        elif dt.itemsize < 4:
            vals = chunk.view(dt)[:n]
        elif dt.itemsize == 4:
            vals = chunk.view(dt)
        else:
            vals = chunk.view(dt)
        out.append(vals.reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, out)


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


def _materialize(result: Any) -> Any:
    return jax.tree.map(np.asarray, result)


class StreamExecutor:
    """Depth-N software pipeline over a DevicePipeline.

    ``submit(frame)`` enqueues H2D + compute for this frame and returns a
    list of completed older results (possibly empty) — so the TPU computes
    frame N while the host reads frame N+1 off the bus. With
    ``async_fetch=True`` a worker thread materializes results, overlapping
    readback with the next frame's transfer (in-flight work is still capped
    at ``depth``). ``poll()`` returns already-finished results without
    blocking; ``flush()`` drains everything.
    """

    def __init__(
        self,
        pipeline: DevicePipeline,
        depth: int = 1,
        async_fetch: bool = False,
    ):
        if depth < 1:
            raise ValueError("pipeline depth must be >= 1")
        self.pipeline = pipeline
        self.depth = depth
        self.async_fetch = async_fetch
        self._queue: "deque[Tuple[Any, Any]]" = deque()  # sync mode
        if async_fetch:
            self._inflight: "queue.Queue" = queue.Queue()
            self._done: "queue.Queue" = queue.Queue()
            self._n_inflight = 0
            self._worker = threading.Thread(
                target=self._fetch_loop, daemon=True
            )
            self._worker.start()

    def _fetch_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            fut, meta = item
            try:
                self._done.put((_materialize(fut), meta))
            except Exception as e:  # deliver failures in order too
                self._done.put((e, meta))

    @property
    def pending(self) -> int:
        if self.async_fetch:
            return self._n_inflight
        return len(self._queue)

    def submit(
        self, args: Tuple[Any, ...], meta: Any = None, **kwargs: Any
    ) -> List[Tuple[Any, Any]]:
        device_args = tuple(_host_to_device(a) for a in args)
        fut = self.pipeline(*device_args, **kwargs)
        if not self.async_fetch:
            self._queue.append((fut, meta))
            if len(self._queue) <= self.depth:
                return []
            out = self._pop_one()
            return [out] if out is not None else []
        self._inflight.put((fut, meta))
        self._n_inflight += 1
        ready = self.poll()
        while self._n_inflight - len(ready) > self.depth:  # backpressure
            ready.append(self._pop_done_blocking())
        return ready

    def poll(self) -> List[Tuple[Any, Any]]:
        """Already-materialized results (async mode; [] in sync mode)."""
        out: List[Tuple[Any, Any]] = []
        if self.async_fetch:
            while True:
                try:
                    item = self._done.get_nowait()
                except queue.Empty:
                    break
                # decrement BEFORE _check may raise a worker-delivered
                # exception, or the popped item would inflate pending
                # forever and a later flush() would block on _done.get()
                self._n_inflight -= 1
                out.append(self._check(item))
        return out

    def _pop_done_blocking(
        self, timeout_s: Optional[float] = None
    ) -> Tuple[Any, Any]:
        item = self._done.get(timeout=timeout_s)  # raises queue.Empty
        self._n_inflight -= 1
        return self._check(item)

    @staticmethod
    def _check(item: Tuple[Any, Any]) -> Tuple[Any, Any]:
        if isinstance(item[0], Exception):
            raise item[0]
        return item

    def _pop_one(
        self, timeout_s: Optional[float] = None
    ) -> Optional[Tuple[Any, Any]]:
        if not self._queue:
            return None
        if timeout_s is None:
            result, meta = self._queue.popleft()
            return _materialize(result), meta
        # bounded drain (shutdown): materialize on a helper thread so a
        # wedged link can't hang the caller — np.asarray of an undelivered
        # device buffer blocks with no timeout of its own. On timeout the
        # item stays queued (pending accounting) for the caller to abandon;
        # the daemon thread dies with the process.
        result, meta = self._queue[0]
        box: dict = {}

        def _work() -> None:
            try:
                box["v"] = _materialize(result)
            except Exception as e:  # pragma: no cover - link-dependent
                box["e"] = e

        t = threading.Thread(target=_work, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            return None
        self._queue.popleft()
        if "e" in box:
            raise box["e"]
        return box["v"], meta

    def flush_one(
        self, timeout_s: Optional[float] = None
    ) -> Optional[Tuple[Any, Any]]:
        """Materialize the oldest in-flight result (blocking), or None.

        ``timeout_s`` bounds the wait in BOTH modes; on timeout the result
        stays in flight and None is returned."""
        if self.async_fetch:
            if self._n_inflight == 0:
                return None
            try:
                return self._pop_done_blocking(timeout_s)
            except queue.Empty:
                return None
        return self._pop_one(timeout_s)

    def flush(self, timeout_s: Optional[float] = None) -> List[Tuple[Any, Any]]:
        """Materialize every in-flight result, oldest first.

        ``timeout_s`` bounds the TOTAL drain (both modes): a device/link
        that never delivers must not be able to hang shutdown — remaining
        results stay in ``pending`` for the caller to abandon."""
        out: List[Tuple[Any, Any]] = []
        deadline = (
            None if timeout_s is None else time.monotonic() + timeout_s
        )
        while self.pending:
            left = None
            if deadline is not None:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
            item = self.flush_one(timeout_s=left)
            if item is None:
                break
            out.append(item)
        return out

    def close(self) -> None:
        if self.async_fetch:
            self._inflight.put(None)


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
