"""Loopback test of the zmq JPEG stream bridge (server -> client)."""

import threading
import time

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")

from cuauv_vision_pipeline_tpu.capture_sources.stream_client import (
    StreamClient,
    decode_jpeg,
)
from cuauv_vision_pipeline_tpu.capture_sources.stream_server import encode_jpeg
from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
    BlockAccessor,
    ReadStatus,
)


def test_jpeg_roundtrip():
    # smooth gradient (JPEG-friendly; random noise is the codec's worst case)
    ys, xs = np.mgrid[0:48, 0:64]
    frame = np.stack([ys * 4, xs * 3, (ys + xs) * 2], axis=-1).astype(np.uint8)
    payload = encode_jpeg(frame, quality=95)
    decoded = decode_jpeg(payload)
    assert decoded.shape == frame.shape
    assert np.abs(decoded.astype(int) - frame.astype(int)).mean() < 8


def test_pub_sub_reinjection(unique_direction):
    """Frames published over tcp loopback arrive as '<dir>_stream' blocks."""
    port = 18392
    ctx = zmq.Context()
    pub = ctx.socket(zmq.PUB)
    pub.bind(f"tcp://127.0.0.1:{port}")

    client = StreamClient(f"tcp://127.0.0.1:{port}", suffix="_stream")
    client_thread = threading.Thread(target=client.run_event_loop)
    client_thread.start()
    time.sleep(0.3)  # let SUB connect

    frame = np.full((32, 40, 3), 99, dtype=np.uint8)
    payload = encode_jpeg(frame, quality=95)

    try:
        deadline = time.monotonic() + 10
        got = None
        reader = None
        import os

        from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BLOCK_STUB

        while time.monotonic() < deadline:
            pub.send_multipart([unique_direction.encode(), b"123", payload])
            time.sleep(0.05)
            if reader is None and os.path.exists(
                BLOCK_STUB + unique_direction + "_stream"
            ):
                reader = BlockAccessor(unique_direction + "_stream")
                reader.__enter__()
            if reader is not None:
                status, data, t = reader.read_frame()
                if status == ReadStatus.SUCCESS:
                    got = (np.array(data), t)
                    break
        assert got is not None, "no frame arrived over the bridge"
        data, t = got
        assert t == 123
        assert data.shape == (32, 40, 3)
        assert abs(int(data.mean()) - 99) < 10
        if reader is not None:
            reader.__exit__(None, None, None)
    finally:
        client.quit_flag.set()
        client_thread.join(timeout=10)
        pub.close(0)
        ctx.term()
