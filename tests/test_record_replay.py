"""RecordMono -> capture_sources/video.py roundtrip: the record/replay
resume story BASELINE config 2 measures (reference modules/record.py:
101-133, capture_sources/video.py:9-56).

Covers: mission-gated recording of a live bus direction to mp4, a header
fps derived from the MEASURED frame delivery rate (not the module tick
rate — see RecordMono's rate-estimation buffer), and replay of the
finished clip back onto the bus at the recorded rate.
"""

from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(argv, tag):
    logf = open(f"/tmp/recrep_{tag}.log", "wb")
    return subprocess.Popen(
        [sys.executable, "-m"] + argv,
        stdout=logf,
        stderr=subprocess.STDOUT,
        cwd=ROOT,
        env=dict(os.environ),
    )


def _stop(*procs, timeout=15):
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGINT)
    end = time.monotonic() + timeout
    for p in procs:
        try:
            p.wait(timeout=max(0.1, end - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()


@pytest.fixture
def clean_bus():
    for name in os.listdir("/dev/shm"):
        if name.startswith("auv_visiond_") or name.startswith("auv_shm_"):
            try:
                os.unlink(os.path.join("/dev/shm", name))
            except OSError:
                pass
    yield


def test_record_mono_roundtrip(tmp_path, clean_bus):
    import cv2

    from cuauv_vision_pipeline_tpu.core import shm

    fps = 20
    shm.active_mission.log_path.set(str(tmp_path))
    shm.active_mission.active.set(True)

    src = _spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "reccam",
            "--scene",
            "gate",
            "--width",
            "256",
            "--height",
            "144",
            "--fps",
            str(fps),
        ],
        "src",
    )
    rec = _spawn(
        [
            "cuauv_vision_pipeline_tpu.modules.record",
            "--mono",
            "reccam",
            "--fps",
            str(fps),
        ],
        "rec",
    )
    clip = None
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            hits = glob.glob(str(tmp_path / "record-mono-*.mp4"))
            if hits and os.path.getsize(hits[0]) > 20_000:
                clip = hits[0]
                break
            assert src.poll() is None, "source died while recording"
            assert rec.poll() is None, "recorder died while recording"
            time.sleep(0.5)
        assert clip is not None, "recorder produced no mp4"
        # mission off -> the recorder releases the writer (finalizes moov)
        shm.active_mission.active.set(False)
        time.sleep(2.0)
    finally:
        _stop(rec, src)

    cap = cv2.VideoCapture(clip)
    assert cap.isOpened(), f"unplayable recording: {clip}"
    header_fps = cap.get(cv2.CAP_PROP_FPS)
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (144, 256, 3)
    assert n_frames >= 10
    # header must track the MEASURED delivery rate; the synthetic source
    # holds its rate, so the header lands near the nominal fps (wide band:
    # single-core CI hosts jitter the delivery clock)
    assert 0.5 * fps <= header_fps <= 1.6 * fps, (
        f"header {header_fps} fps vs delivery {fps} fps"
    )
    # content sanity: recorded frames are the gate scene, not black
    assert frame.mean() > 10

    # --- replay leg: the clip back onto the bus at the recorded rate ---
    from cuauv_vision_pipeline_tpu.core.base import VideoSource
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import ReadStatus

    play = _spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.video",
            f"{clip}:replaycam",
            "--loop",
        ],
        "play",
    )
    try:
        acc = VideoSource.create("replaycam").into_accessor()
        deadline = time.monotonic() + 60
        opened = False
        while time.monotonic() < deadline:
            try:
                acc.__enter__()
                opened = True
                break
            except Exception:
                time.sleep(0.5)
        assert opened, "replay source never created the bus block"
        try:
            # measure the replay delivery rate from acquisition stamps
            stamps = []
            t_end = time.monotonic() + 3.0
            while time.monotonic() < t_end:
                status, frame, acq = acc.read_frame()
                if status == ReadStatus.SUCCESS:
                    assert frame.shape == (144, 256, 3)
                    if not stamps or acq != stamps[-1]:
                        stamps.append(acq)
                time.sleep(0.005)
            assert len(stamps) >= 5, "replay delivered too few frames"
            rate = (len(stamps) - 1) * 1000.0 / (stamps[-1] - stamps[0])
            # replay paces itself by the header fps; verify it is in the
            # recorded band (not the 2-3x distortion a module-tick header
            # would produce when source and module rates diverge)
            assert 0.4 * header_fps <= rate <= 1.7 * header_fps, (
                f"replay at {rate:.1f} fps vs header {header_fps:.1f}"
            )
        finally:
            acc.__exit__(None, None, None)
    finally:
        _stop(play)


def test_record_mono_header_uses_measured_rate(tmp_path, clean_bus):
    """Module ticking FASTER than the source delivers: the header must
    reflect delivery (~10 fps), not the 50 fps tick rate — the exact
    silent replay-speed distortion the old --fps header produced."""
    import cv2

    from cuauv_vision_pipeline_tpu.core import shm

    shm.active_mission.log_path.set(str(tmp_path))
    shm.active_mission.active.set(True)
    src = _spawn(
        [
            "cuauv_vision_pipeline_tpu.capture_sources.synthetic",
            "reccam2",
            "--width",
            "128",
            "--height",
            "80",
            "--fps",
            "10",
        ],
        "src2",
    )
    rec = _spawn(
        [
            "cuauv_vision_pipeline_tpu.modules.record",
            "--mono",
            "reccam2",
            "--fps",
            "50",
        ],
        "rec2",
    )
    clip = None
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            hits = glob.glob(str(tmp_path / "record-mono-*.mp4"))
            if hits and os.path.getsize(hits[0]) > 5_000:
                clip = hits[0]
                break
            time.sleep(0.5)
        assert clip is not None, "recorder produced no mp4"
        shm.active_mission.active.set(False)
        time.sleep(2.0)
    finally:
        _stop(rec, src)

    cap = cv2.VideoCapture(clip)
    assert cap.isOpened()
    header_fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    assert header_fps <= 25, (
        f"header {header_fps} fps tracks the 50 fps module tick, not the "
        "10 fps delivery"
    )
