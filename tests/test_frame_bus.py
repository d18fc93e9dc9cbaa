"""Frame bus unit tests.

Covers the properties the reference never tested (SURVEY.md §4): seqlock
torn-read safety under a concurrent writer, latest-wins, NO_NEW_FRAME,
FRAMEWORK_DELETED propagation, multi-plane layout, plane names, dtype
round-trips, blocking reads, cross-process access, and staging reads.
"""

import multiprocessing as mp
import threading
import time

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
    BLOCK_STUB,
    BlockAccessor,
    ReadStatus,
    WriteStatus,
    frame_bytes,
)


def test_create_write_read_roundtrip(unique_direction):
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    with BlockAccessor(unique_direction, img.nbytes) as block:
        assert block.write_frame(123, img) == WriteStatus.SUCCESS
        status, data, t = block.read_frame()
        assert status == ReadStatus.SUCCESS
        assert t == 123
        np.testing.assert_array_equal(data, img)


def test_no_new_frame_after_consume(unique_direction):
    img = np.zeros((4, 4, 1), dtype=np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as block:
        block.write_frame(1, img)
        status, _, _ = block.read_frame()
        assert status == ReadStatus.SUCCESS
        status, _, _ = block.read_frame()
        assert status == ReadStatus.NO_NEW_FRAME


def test_latest_wins(unique_direction):
    """Multiple writes between reads: the reader sees only the newest frame."""
    img = np.zeros((8, 8), dtype=np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as block:
        for i in range(10):
            block.write_frame(i, np.full((8, 8), i, dtype=np.uint8))
        status, data, t = block.read_frame()
        assert status == ReadStatus.SUCCESS
        assert t == 9
        assert data.flat[0] == 9


def test_empty_block_has_no_frame(unique_direction):
    with BlockAccessor(unique_direction, 64) as block:
        status, data, _ = block.read_frame()
        assert status == ReadStatus.NO_NEW_FRAME
        assert data is None


def test_multi_plane_names_and_dtypes(unique_direction):
    rgb = np.random.randint(0, 255, (6, 8, 3), dtype=np.uint8)
    depth = np.random.rand(6, 8, 1).astype(np.float32)
    normal = np.random.rand(6, 8, 3).astype(np.float64)
    size = frame_bytes(
        (rgb.shape, np.uint8), (depth.shape, np.float32), (normal.shape, np.float64)
    )
    with BlockAccessor(unique_direction, size) as block:
        block.write_frame(5, [("rgb", rgb), ("depth", depth), ("normal", normal)])
        status, data, t = block.read_frame()
        assert status == ReadStatus.SUCCESS
        assert isinstance(data, tuple) and len(data) == 3
        np.testing.assert_array_equal(data[0], rgb)
        np.testing.assert_array_equal(data[1], depth)
        np.testing.assert_array_equal(data[2], normal)
        assert block.last_plane_names() == ("rgb", "depth", "normal")


def test_half_dtype_plane(unique_direction):
    """2-byte element planes (new in the rebuild, for f16/bf16 payloads)."""
    half = np.random.rand(4, 4, 1).astype(np.float16)
    with BlockAccessor(unique_direction, frame_bytes((half.shape, np.float16))) as b:
        b.write_frame(1, half)
        status, data, _ = b.read_frame()
        assert status == ReadStatus.SUCCESS
        np.testing.assert_array_equal(data, half)


def test_open_mode_sees_creator_frames(unique_direction):
    img = np.random.randint(0, 255, (5, 7, 3), dtype=np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as writer:
        writer.write_frame(77, img)
        with BlockAccessor(unique_direction) as reader:
            status, data, t = reader.read_frame()
            assert status == ReadStatus.SUCCESS
            assert t == 77
            np.testing.assert_array_equal(data, img)


def test_framework_deleted_propagates(unique_direction):
    img = np.zeros((4, 4), dtype=np.uint8)
    writer = BlockAccessor(unique_direction, img.nbytes)
    writer.__enter__()
    writer.write_frame(1, img)
    reader = BlockAccessor(unique_direction)
    reader.__enter__()
    status, _, _ = reader.read_frame()
    assert status == ReadStatus.SUCCESS
    writer.__exit__(None, None, None)  # creator teardown
    status, _, _ = reader.read_frame()
    assert status == ReadStatus.FRAMEWORK_DELETED
    reader.__exit__(None, None, None)


def test_write_too_large_raises(unique_direction):
    with BlockAccessor(unique_direction, 16) as block:
        with pytest.raises(RuntimeError):
            block.write_frame(0, np.zeros((64, 64), dtype=np.uint8))


def test_returned_views_are_writable(unique_direction):
    """Staging reads hand out writable arrays: no defensive copy needed
    (the reference had to copy, core/base.py:761-768)."""
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as block:
        block.write_frame(0, img)
        _, data, _ = block.read_frame()
        data[:] = 7  # must not raise
        assert (data == 7).all()


def test_blocking_read_wakes_on_write(unique_direction):
    img = np.full((4, 4), 3, dtype=np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as writer:

        def delayed_write():
            time.sleep(0.15)
            writer.write_frame(42, img)

        with BlockAccessor(unique_direction, block_thread=True) as reader:
            t = threading.Thread(target=delayed_write)
            t.start()
            start = time.monotonic()
            status, data, acq = reader.read_frame()
            waited = time.monotonic() - start
            t.join()
            assert status == ReadStatus.SUCCESS
            assert acq == 42
            assert 0.05 < waited < 1.0  # woke on publish, not on timeout


def test_blocking_read_times_out(unique_direction):
    with BlockAccessor(unique_direction, 64) as writer:  # noqa: F841
        with BlockAccessor(unique_direction, block_thread=True) as reader:
            start = time.monotonic()
            status, _, _ = reader.read_frame()
            waited = time.monotonic() - start
            assert status == ReadStatus.NO_NEW_FRAME
            assert waited >= 0.9  # ~1 s timeout like the reference


class _HammerWriter(threading.Thread):
    """Writes recognizable frames as fast as possible."""

    def __init__(self, accessor, n_writes, shape):
        super().__init__()
        self.accessor = accessor
        self.n_writes = n_writes
        self.shape = shape

    def run(self):
        for i in range(1, self.n_writes + 1):
            frame = np.full(self.shape, i % 251, dtype=np.uint8)
            self.accessor.write_frame(i, frame)
            if i % 50 == 0:
                time.sleep(0.001)  # let the GIL-bound reader sample the stream


def test_seqlock_no_torn_reads_under_concurrent_writer(unique_direction):
    """The core seqlock property: every successful read returns a frame that
    is internally consistent (all bytes from one write), even while a writer
    hammers the ring."""
    shape = (64, 64, 3)
    n_writes = 2000
    with BlockAccessor(unique_direction, int(np.prod(shape))) as writer:
        with BlockAccessor(unique_direction) as reader:
            w = _HammerWriter(writer, n_writes, shape)
            w.start()
            seen = 0
            last_t = 0
            while w.is_alive() or seen == 0:
                status, data, t = reader.read_frame()
                if status == ReadStatus.SUCCESS:
                    seen += 1
                    # torn-read check: the frame must be uniform
                    assert (data == data.flat[0]).all(), "torn frame detected"
                    # payload/metadata consistency: value encodes the uid
                    assert data.flat[0] == t % 251
                    # monotonic: never read an older frame than before
                    assert t > last_t
                    last_t = t
            w.join()
            assert seen > 10  # the reader actually sampled the stream


def _proc_writer(direction, done_event, shape):
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor

    # Write until the reader signals it has seen enough (keeps the block
    # alive across the reader's 1 Hz open-retry), with a hard cap.
    with BlockAccessor(direction, int(np.prod(shape))) as writer:
        i = 0
        deadline = time.monotonic() + 60
        while not done_event.is_set() and time.monotonic() < deadline:
            i += 1
            writer.write_frame(i, np.full(shape, i % 251, dtype=np.uint8))
            time.sleep(0.0005)


def test_cross_process_no_torn_reads(unique_direction):
    """Same property across a real process boundary (the production topology:
    capture process -> module process)."""
    shape = (32, 32, 3)
    ctx = mp.get_context("spawn")
    done_event = ctx.Event()
    proc = ctx.Process(target=_proc_writer, args=(unique_direction, done_event, shape))
    proc.start()
    try:
        with BlockAccessor(unique_direction, block_thread=True) as reader:
            seen = 0
            last_t = 0
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline and seen < 50:
                status, data, t = reader.read_frame()
                if status == ReadStatus.SUCCESS:
                    seen += 1
                    assert (data == data.flat[0]).all()
                    assert data.flat[0] == t % 251
                    assert t > last_t
                    last_t = t
                elif status == ReadStatus.FRAMEWORK_DELETED:
                    break
            assert seen >= 50
    finally:
        done_event.set()
        proc.join(timeout=30)
        assert proc.exitcode == 0


def test_block_file_uses_reference_prefix(unique_direction):
    import os

    with BlockAccessor(unique_direction, 64):
        assert os.path.exists(BLOCK_STUB + unique_direction)
    assert not os.path.exists(BLOCK_STUB + unique_direction)


def test_native_selftest_binary():
    """Build and run the C++ self-test (seqlock hammer etc. at the native
    layer, no Python in the loop)."""
    import subprocess
    from pathlib import Path

    native = Path(__file__).resolve().parent.parent / (
        "cuauv_vision_pipeline_tpu/native"
    )
    result = subprocess.run(
        ["make", "-s", "test"], cwd=native, capture_output=True, text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert "all native tests passed" in result.stdout
