"""Native (C++) components of the TPU vision pipeline.

Builds and loads libframebus.so — the host-side lock-free shared-memory frame
bus (the reference's camera_message_framework equivalent; see
include/framebus.hpp for the design).
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent
_LIB_PATH = _NATIVE_DIR / "build" / "libframebus.so"


def library_path(rebuild: bool = False) -> str:
    """Return the path to libframebus.so, building it on demand.

    The build is a single g++ invocation (see Makefile); results are cached in
    native/build/. Set rebuild=True to force a rebuild.
    """
    if rebuild or not _LIB_PATH.exists() or _is_stale():
        build()
    return str(_LIB_PATH)


def _is_stale() -> bool:
    try:
        lib_mtime = _LIB_PATH.stat().st_mtime
    except FileNotFoundError:
        return True
    for src in list((_NATIVE_DIR / "src").glob("*.cpp")) + list(
        (_NATIVE_DIR / "include").glob("*.hpp")
    ):
        if src.stat().st_mtime > lib_mtime:
            return True
    return False


def build() -> None:
    env = dict(os.environ)
    subprocess.run(
        ["make", "-s"],
        cwd=str(_NATIVE_DIR),
        env=env,
        check=True,
        capture_output=True,
    )


if __name__ == "__main__":
    build()
    print(_LIB_PATH)
