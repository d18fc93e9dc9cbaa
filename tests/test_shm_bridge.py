"""Cross-host shm mirror (misc/shm_bridge.py): publisher watches group seq
words, subscriber auto-defines and applies snapshots (zmq over localhost)."""

import threading
import time
import uuid

import numpy as np
import pytest

pytest.importorskip("zmq")

from cuauv_vision_pipeline_tpu.core import shm
from cuauv_vision_pipeline_tpu.misc import shm_bridge


def test_bridge_mirrors_group_updates(unique_direction):
    name = f"bridge_{uuid.uuid4().hex[:8]}"
    g = shm.define_group(
        name,
        {"visible": ["bool", False], "area": ["float", 0.0],
         "count": ["int", 0], "label": ["string", ""]},
    )

    port = 5800 + (int(uuid.uuid4().hex[:4], 16) % 1000)
    endpoint = f"tcp://127.0.0.1:{port}"
    pub = threading.Thread(
        target=shm_bridge.publish,
        args=(endpoint, [name], False),
        kwargs={"duration_s": 5.0},
        daemon=True,
    )
    sub = threading.Thread(
        target=shm_bridge.subscribe,
        args=(f"tcp://127.0.0.1:{port}",),
        kwargs={"prefix": "mirror_", "duration_s": 5.0},
        daemon=True,
    )
    pub.start()
    time.sleep(0.4)
    sub.start()
    time.sleep(0.6)  # SUB connect + initial snapshot

    g.set(visible=True, area=123.5, count=7, label="buoy")
    deadline = time.monotonic() + 8
    mirrored = None
    while time.monotonic() < deadline:
        try:
            m = shm.group("mirror_" + name).get()
            if m.area == 123.5:
                mirrored = m
                break
        except KeyError:
            pass
        time.sleep(0.05)
    assert mirrored is not None, "snapshot never arrived"
    assert mirrored.visible is True
    assert mirrored.count == 7
    assert mirrored.label == "buoy"

    # updates keep flowing
    g.set(area=42.0)
    deadline = time.monotonic() + 6
    while time.monotonic() < deadline:
        if shm.group("mirror_" + name).get().area == 42.0:
            break
        time.sleep(0.05)
    assert shm.group("mirror_" + name).get().area == 42.0

    pub.join(timeout=15)
    sub.join(timeout=15)
