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
