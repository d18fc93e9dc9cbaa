"""SDK-gated capture binaries must COMPILE+LINK against inert stub headers
(native/test_stubs/) — CI-style proof the vehicle-only code builds without
the vendor SDKs (reference gates the same binaries on CUAUV_CONTEXT,
reference configure.py:42-86)."""

import os
import subprocess
import sys

NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cuauv_vision_pipeline_tpu",
    "native",
)


def test_sdk_gated_binaries_build_against_stubs():
    result = subprocess.run(
        ["make", "-C", NATIVE, "stubcheck"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    for binary in ("zed_capture_stubcheck", "flir_capture_stubcheck"):
        path = os.path.join(NATIVE, "build", binary)
        assert os.path.exists(path), f"{binary} not produced"


def test_flir_stub_binary_parses_config():
    """The SDK-less flir binary's --parse-only path reads the bundled TOML."""
    conf = os.path.join(
        os.path.dirname(NATIVE), "configs", "flir.conf"
    )
    subprocess.run(["make", "-C", NATIVE, "build/flir_capture_stub"], check=True,
                   capture_output=True, timeout=300)
    result = subprocess.run(
        [os.path.join(NATIVE, "build", "flir_capture_stub"), "--parse-only", conf],
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert result.returncode == 0, result.stderr
    assert "serial=" in result.stdout


def _build_stubcheck():
    subprocess.run(
        ["make", "-C", NATIVE, "stubcheck"],
        check=True,
        capture_output=True,
        timeout=300,
    )


def test_zed_stub_capture_loop_writes_aggregate_frame():
    """The zed capture UDL EXECUTES against the frame-producing SDK stub:
    grab -> retrieve x4 -> RGBA->RGB + normal [-1,1]->[0,1] + NaN scrub ->
    one aggregated 4-plane bus frame (zed_capture.cpp:61-96, mirroring
    reference zed.cpp:139-214). A Python reader asserts names, dtypes,
    view markers, and the scrubbed values."""
    import signal as _signal

    import numpy as np

    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
        BLOCK_STUB,
        BlockAccessor,
        ReadStatus,
    )

    _build_stubcheck()
    shm.zed_calibration.seq  # ensure the calib group file exists
    if os.path.exists(BLOCK_STUB + "zed"):
        os.unlink(BLOCK_STUB + "zed")
    proc = subprocess.Popen(
        [os.path.join(NATIVE, "build", "zed_capture_stubcheck")],
        cwd=NATIVE,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        with BlockAccessor("zed") as acc:
            status = None
            for _ in range(100):
                status, data, _acq = acc.read_frame()
                if status == ReadStatus.SUCCESS:
                    break
                import time

                time.sleep(0.1)
            assert status == ReadStatus.SUCCESS, "no frame from the stub UDL"
            assert acc.last_plane_names() == (
                "forward",
                "forward2",
                "depth",
                "normal",
            )
            fwd, fwd2, depth, normal = data
            assert fwd.shape == (180, 320, 3) and fwd.dtype == np.uint8
            assert fwd[0, 5, 2] == 200  # RIGHT view marker
            assert fwd2[0, 5, 2] == 100  # LEFT view marker
            assert depth.dtype == np.float32
            assert depth[0, 0, 0] == 0.0  # NaN scrubbed
            assert depth[10, 10, 0] == 2.5
            assert normal.dtype == np.float32
            assert abs(normal[10, 10, 0] - 1.0) < 1e-6  # +1 -> 1.0
            assert abs(normal[10, 10, 1] - 0.0) < 1e-6  # -1 -> 0.0
            assert abs(normal[10, 10, 2] - 0.5) < 1e-6  # 0 -> 0.5
            assert abs(normal[0, 0, 0] - 0.5) < 1e-6  # NaN -> 0 -> 0.5
    finally:
        proc.send_signal(_signal.SIGKILL)
        proc.wait()
        if os.path.exists(BLOCK_STUB + "zed"):
            os.unlink(BLOCK_STUB + "zed")


def test_flir_stub_capture_loop_writes_frames(tmp_path):
    """The flir capture UDL EXECUTES against the frame-producing Spinnaker
    stub: config parse -> acquire -> BGR convert -> per-direction bus write
    (flir_capture.cpp:78-115, mirroring reference flir.cpp:144-174)."""
    import signal as _signal
    import time

    import numpy as np

    from cuauv_vision_pipeline_tpu.core import shm
    from cuauv_vision_pipeline_tpu.core.bindings.frame_bus import (
        BLOCK_STUB,
        BlockAccessor,
        ReadStatus,
    )

    _build_stubcheck()
    shm.flir_calibration.seq
    conf = tmp_path / "flir.conf"
    conf.write_text(
        '[[camera]]\nserial = "STUB1"\ndirection = "flirstubtest"\n'
        "width = 160\nheight = 120\nfps = 30\n"
    )
    if os.path.exists(BLOCK_STUB + "flirstubtest"):
        os.unlink(BLOCK_STUB + "flirstubtest")
    proc = subprocess.Popen(
        [os.path.join(NATIVE, "build", "flir_capture_stubcheck"), str(conf)],
        cwd=NATIVE,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        with BlockAccessor("flirstubtest") as acc:
            status = None
            for _ in range(100):
                status, data, _acq = acc.read_frame()
                if status == ReadStatus.SUCCESS:
                    break
                time.sleep(0.1)
            assert status == ReadStatus.SUCCESS, "no frame from the stub UDL"
            assert data.shape == (120, 160, 3) and data.dtype == np.uint8
            assert data[0, 0, 2] == 77  # R marker
            assert data[5, 0, 1] == 5  # G encodes the row
    finally:
        proc.send_signal(_signal.SIGKILL)
        proc.wait()
        if os.path.exists(BLOCK_STUB + "flirstubtest"):
            os.unlink(BLOCK_STUB + "flirstubtest")
