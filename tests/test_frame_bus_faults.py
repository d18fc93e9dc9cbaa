"""Fault-injection + soak tests for the frame bus.

The reference never rehearsed producer failures (SURVEY.md §4/§5) — here a
deterministic fault model (core/bindings/fault_injection.py) stands in for
a misbehaving camera/driver: dropped frames, corrupted payload bursts,
write stalls.  The soak test combines them with a SIGKILLed writer and
asserts the reader end survives everything with valid frame headers and
monotonic timestamps.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.core.bindings.fault_injection import FaultPlan
from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
    BlockAccessor,
    ReadStatus,
    WriteStatus,
)


def test_parse_plan_and_unknown_key():
    plan = FaultPlan.parse("drop=0.25, corrupt=0.1, delay_ms=5, seed=9")
    assert plan.drop == 0.25 and plan.corrupt == 0.1 and plan.delay_ms == 5
    with pytest.raises(ValueError, match="unknown bus fault 'dorp'"):
        FaultPlan.parse("dorp=0.5")


def test_plan_determinism():
    a, b = FaultPlan.parse("drop=0.5,seed=3"), FaultPlan.parse("drop=0.5,seed=3")
    planes = [np.zeros(16, np.uint8)]
    seq_a = [a.apply_write(planes) is None for _ in range(50)]
    seq_b = [b.apply_write(planes) is None for _ in range(50)]
    assert seq_a == seq_b and any(seq_a) and not all(seq_a)


def test_drop_all_writes_nothing(unique_direction, monkeypatch):
    monkeypatch.setenv("CUAUV_BUS_FAULTS", "drop=1.0")
    img = np.full((4, 4), 7, np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as block:
        assert block.write_frame(1, img) == WriteStatus.SUCCESS
        status, *_ = block.read_frame()
        assert status == ReadStatus.NO_NEW_FRAME
        assert block._faults.counters["dropped"] == 1


def test_corrupt_damages_payload_not_headers(unique_direction, monkeypatch):
    monkeypatch.setenv("CUAUV_BUS_FAULTS", "corrupt=1.0,seed=1")
    img = np.zeros((32, 32), np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as block:
        block.write_frame(5, img)
        status, data, t = block.read_frame()
        assert status == ReadStatus.SUCCESS
        assert t == 5
        assert data.reshape(img.shape).dtype == img.dtype  # header intact
        assert data.any()  # the burst flipped some zero bytes
        assert not img.any()  # caller's array untouched


def test_caller_sees_no_faults_when_env_unset(unique_direction):
    img = np.arange(16, dtype=np.uint8)
    with BlockAccessor(unique_direction, img.nbytes) as block:
        assert block._faults is None
        block.write_frame(2, img)
        status, data, _ = block.read_frame()
        assert status == ReadStatus.SUCCESS
        np.testing.assert_array_equal(data.ravel(), img)


_WRITER = r"""
import ctypes, os, signal, sys, time
import numpy as np
# die with the parent: a hard-killed pytest run must not leak producers
# that keep writing into /dev/shm (PR_SET_PDEATHSIG = 1)
ctypes.CDLL(None, use_errno=True).prctl(1, signal.SIGKILL, 0, 0, 0)
if os.getppid() == 1:  # parent already gone before prctl landed
    sys.exit(0)
sys.path.insert(0, {repo!r})
from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import BlockAccessor
direction = sys.argv[1]
with BlockAccessor(direction, 4096) as block:
    i = 0
    while True:
        # self-describing frame: every byte equals the sequence number
        frame = np.full(4096, i % 251, np.uint8)
        block.write_frame(1000 + i, frame)
        i += 1
        time.sleep(0.001)
"""


@pytest.mark.slow
def test_soak_faulty_writer_sigkill_recovery(unique_direction, tmp_path):
    """~8s soak: faulty producer (drop+corrupt+stall) is SIGKILLed mid-run
    and restarted; the reader must survive with valid headers and
    non-decreasing timestamps throughout, and corrupted payloads must be
    detectable by content (never by crash)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "writer.py"
    script.write_text(_WRITER.format(repo=repo))
    env = dict(
        os.environ,
        CUAUV_BUS_FAULTS="drop=0.2,corrupt=0.1,stall_every=100,stall_ms=50,seed=3",
        JAX_PLATFORMS="cpu",
    )

    errlog = open(tmp_path / "writer.err", "wb")

    def spawn():
        return subprocess.Popen(
            [sys.executable, str(script), unique_direction],
            env=env,
            stderr=errlog,
        )

    writer = spawn()
    deadline = time.monotonic() + 20  # subprocess pays the jax import cost
    with BlockAccessor(unique_direction, 4096, block_thread=True) as reader:
        # wait until frames flow
        while time.monotonic() < deadline:
            status, *_ = reader.read_frame()  # blocks <=1s (futex timeout)
            if status == ReadStatus.SUCCESS:
                break
        else:
            writer.kill()
            pytest.fail(
                "no frames from faulty writer within 20s: "
                + (tmp_path / "writer.err").read_text()[-500:]
            )

        stats = {"frames": 0, "corrupted": 0}
        last_t = 0

        def drain(seconds):
            end = time.monotonic() + seconds
            nonlocal last_t
            while time.monotonic() < end:
                status, data, t = reader.read_frame()  # <=1s block
                if status != ReadStatus.SUCCESS:
                    continue
                assert t >= last_t, "timestamps went backwards"
                last_t = t
                data = data.ravel()
                assert data.size == 4096 and data.dtype == np.uint8
                stats["frames"] += 1
                if not (data == data[0]).all():
                    stats["corrupted"] += 1

        drain(3.0)
        os.kill(writer.pid, signal.SIGKILL)  # producer dies mid-stream
        writer.wait()
        time.sleep(0.2)
        writer = spawn()  # and comes back
        last_t = 0  # new producer generation restarts its clock
        drain(3.0)
        writer.kill()
        writer.wait()

    assert stats["frames"] > 100, f"soak starved: {stats}"
    assert stats["corrupted"] > 0, "corrupt=0.1 never materialized"
    # corruption is bounded: bursts hit a strict subset of frames
    assert stats["corrupted"] < stats["frames"] / 2, stats
